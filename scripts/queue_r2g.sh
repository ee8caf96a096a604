#!/bin/bash
# Chip queue, part 6: chained on queue_r2f (PID arg). One stage — SPRING
# probe arm 2 at heavy damping. Probe 1 (runs/c_spring_probe, damping 1e-3)
# tracked the KFAC plateau for ~250 iters (HIGHEST-precision fix holds on
# chip) then crept non-variational as the lam=1e-3 solve fitted batch noise
# of the converged trial; this arm tests damping=0.1 as the cure. Skipped
# automatically if the r2f stages run to the wire.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue8.log
HARD_END="${1:?hard_end epoch}"
WAIT_PID="${2:?queue_r2f pid}"
echo "=== queue_r2g start $(date) hard_end=$(date -d @$HARD_END) wait=$WAIT_PID ===" >> "$Q"

while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
echo "=== queue_r2f ($WAIT_PID) exited $(date) ===" >> "$Q"

now=$(date +%s)
remaining=$(( HARD_END - now ))
if [ "$remaining" -lt 900 ]; then
  echo "=== c_spring_probe2 SKIPPED (only ${remaining}s left) $(date) ===" >> "$Q"
  exit 0
fi
echo "=== c_spring_probe2 start tmo=${remaining}s $(date) ===" >> "$Q"
timeout "$remaining" python -u scripts/run_c_spring_big.py 700 \
  /root/repo/runs/c_spring_probe2 /root/repo/runs/c_kfac_big \
  0.1 0.01 0.99 > runs/c_spring_probe2.log 2>&1
echo "=== c_spring_probe2 done rc=$? $(date) ===" >> "$Q"
