#!/bin/bash
# Queue r2r: continue the wide flagship arm (runs/c_kfac_wide) after the
# c_wide1 leg wedged at t=5065 (host process stuck in a futex wait with a
# HEALTHY tunnel — a fresh client ran ops fine; suspected stream collision
# with the concurrently-running CPU test suite). Waits for a given PID (the
# pytest run) before touching the chip, health-gates like queue_r2o, then
# restores-and-continues.
#
# Usage: nohup bash scripts/queue_r2r.sh <hard_end_epoch> [wait_pid] &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_r2r.log
HARD_END="${1:?hard_end epoch required}"
WAIT_PID="${2:-}"
echo "=== queue_r2r start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "=== wait_pid $WAIT_PID exited $(date) ===" >> "$Q"
fi

wait_for_tpu () {
  while true; do
    local now remaining
    now=$(date +%s); remaining=$(( HARD_END - now ))
    if [ "$remaining" -lt 900 ]; then return 1; fi
    if timeout 180 python -c "import jax; jax.devices(); import jax.numpy as jnp; jnp.ones(4).sum().block_until_ready()" > /dev/null 2>&1; then
      echo "=== tpu healthy $(date) ===" >> "$Q"
      return 0
    fi
    echo "=== tpu still down $(date) ===" >> "$Q"
    sleep 120
  done
}

run_stage () {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if ! wait_for_tpu; then
    echo "=== $name SKIPPED (no tpu / no time) $(date) ===" >> "$Q"
    return
  fi
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

now=$(date +%s)
train_budget=$(( HARD_END - now - 1200 ))
run_stage c_wide2 "$train_budget" python -u \
  scripts/run_c_ccecp_kfac_fstream.py "$train_budget" \
  /root/repo/runs/c_kfac_wide forward 16 512

bash scripts/export_artifacts.sh c_kfac_wide >> "$Q" 2>&1
echo "=== queue_r2r finished $(date) ===" >> "$Q"
