#!/bin/bash
# After queue_r3x: frozen-eval the SPRING probe-2 final params (its training
# tail descended BELOW the parent plateau; probe 1 taught us to distrust
# training-time energies of sample-space methods at convergence).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_r3y.log
HARD_END="${1:?hard_end epoch required}"
echo "=== queue_r3y start $(date) ===" >> "$Q"
while ! grep -q "queue_r3x finished" runs/chip_queue_r3x.log 2>/dev/null; do
  [ "$(date +%s)" -ge $(( HARD_END - 1800 )) ] && { echo "=== no time ===" >> "$Q"; exit 0; }
  sleep 60
done
now=$(date +%s); tmo=$(( HARD_END - now - 1500 ))
if [ "$tmo" -lt 600 ]; then echo "=== eval SKIPPED ===" >> "$Q"; exit 0; fi
[ "$tmo" -gt 2400 ] && tmo=2400
echo "=== spring_eval start tmo=${tmo}s $(date) ===" >> "$Q"
timeout "$tmo" python -u scripts/eval_frozen_c.py /root/repo/runs/c_spring_probe2 \
  600 1024 ferminet 256 16 forward > runs/eval_spring_probe2.log 2>&1
echo "=== spring_eval done rc=$? $(date) ===" >> "$Q"
echo "=== queue_r3y finished $(date) ===" >> "$Q"
