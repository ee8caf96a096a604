#!/bin/bash
# Chip queue, part 7: uses the ~2h recovered by killing the hung twist_b
# (tunnel stall, PID verified via /proc tree; partial run kept at t=1148).
#   1. finish twist_b by restore-and-continue (completes the TABC pair)
#   2. round-3 Arm A preview: lr-boost KFAC continuation (delay 3000->10000)
#      branched into runs/c_kfac_lrboost — answers the schedule-starvation
#      hypothesis tonight; timeout-bounded, checkpoints every 10 min.
# Chained on queue_r2g (probe2); every stage clamps to HARD_END.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue8.log
HARD_END="${1:?hard_end epoch}"
WAIT_PID="${2:?queue_r2g pid}"
echo "=== queue_r2h start $(date) hard_end=$(date -d @$HARD_END) wait=$WAIT_PID ===" >> "$Q"

while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
echo "=== queue_r2g ($WAIT_PID) exited $(date) ===" >> "$Q"

run_stage () {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  local now remaining
  now=$(date +%s)
  remaining=$(( HARD_END - now ))
  if [ "$remaining" -lt 900 ]; then
    echo "=== $name SKIPPED (only ${remaining}s left) $(date) ===" >> "$Q"
    return
  fi
  if [ "$tmo" -gt "$remaining" ]; then tmo=$remaining; fi
  echo "=== $name start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name done rc=$? $(date) ===" >> "$Q"
}

run_stage diamond_twist_b2 2700 python -u scripts/run_diamond_ccecp.py 2400 \
  /root/repo/runs/diamond_twist_b 0.25 -0.25 0.25

run_stage c_kfac_lrboost 20000 python -u scripts/run_c_ccecp_kfac_big.py \
  20000 /root/repo/runs/c_kfac_lrboost 0.05 10000 /root/repo/runs/c_kfac_big

echo "=== queue_r2h finished $(date) ===" >> "$Q"
