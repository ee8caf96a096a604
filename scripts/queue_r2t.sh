#!/bin/bash
# Queue r2t: DMC the wide flagship trial once queue r2s's training legs end.
# Auto-uses the EMA params; forward kinetic (probe green on this toolchain).
#
# Usage: nohup bash scripts/queue_r2t.sh <hard_end_epoch> [wait_pid] &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_r2t.log
HARD_END="${1:?hard_end epoch required}"
WAIT_PID="${2:-}"
echo "=== queue_r2t start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== wait_pid $WAIT_PID exited $(date) ===" >> "$Q"
fi

run_stage () {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  local now remaining
  now=$(date +%s)
  remaining=$(( HARD_END - now - 1200 ))
  if [ "$remaining" -lt 900 ]; then
    echo "=== $name SKIPPED (only ${remaining}s left) $(date) ===" >> "$Q"
    return
  fi
  if [ "$tmo" -gt "$remaining" ]; then tmo=$remaining; fi
  echo "=== $name start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name done rc=$? $(date) ===" >> "$Q"
}

run_stage c_dmc_wide 7200 python -u scripts/run_c_ccecp_dmc_big.py \
  /root/repo/runs/c_kfac_wide 60 40 /root/repo/runs/c_dmc_wide 0.02 \
  ferminet forward 16 512

bash scripts/export_artifacts.sh c_kfac_wide c_dmc_wide >> "$Q" 2>&1
echo "=== queue_r2t finished $(date) ===" >> "$Q"
