#!/bin/bash
# Chip work queue for the round-2 continuation session:
#   1. wait for the in-flight Si all-electron run (pid file /tmp/si_r2.pid or arg)
#   2. TABC average of the valence-ccECP diamond checkpoint (2x2x2 MP grid)
#   3. flagship C ccECP KFAC continuation: restore at t=12000, run to 29000
#   4. DMC from the improved flagship trial
# Each stage is bounded by `timeout`; checkpoints land every ~10 min so a
# timeout mid-train still leaves a usable trial for the DMC stage.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue5.log
echo "=== queue_r2b start $(date) ===" >> "$Q"

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "=== si_vmc (pid $WAIT_PID) finished $(date) ===" >> "$Q"
fi

timeout 7200 python -u scripts/eval_tabc.py /root/repo/runs/diamond_ccecp 2 400 \
  diamond_ccecp > runs/diamond_tabc.log 2>&1
echo "=== tabc done rc=$? $(date) ===" >> "$Q"

timeout 28800 python -u scripts/run_c_ccecp_kfac_big.py 29000 \
  /root/repo/runs/c_kfac_big > runs/c_kfac_big2.log 2>&1
echo "=== flagship continuation done rc=$? $(date) ===" >> "$Q"

timeout 5400 python -u scripts/run_c_ccecp_dmc_big.py /root/repo/runs/c_kfac_big \
  60 40 /root/repo/runs/c_dmc_big2 0.02 > runs/c_dmc_big2.log 2>&1
echo "=== dmc_big2 done rc=$? $(date) ===" >> "$Q"
