#!/bin/bash
# Amendment to queue_r2m.sh (which was stopped after its two probes): the
# pair forward Laplacian FAILED on this box's toolchain (36 Ha miscompile;
# CPU PASSes the same probe), so before trusting laplacian="forward" in the
# Si / arm-C stages this queue first gates the REAL forward Laplacian with
# scripts/probe_forward_real.py and passes the verdict into the run scripts.
#
# Usage: nohup bash scripts/queue_r2m2.sh <hard_end_epoch> [wait_pid] &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p runs
Q=/root/repo/runs/chip_queue_r2m.log
HARD_END="${1:?hard_end epoch required}"
WAIT_PID="${2:-}"
echo "=== queue_r2m2 start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  echo "=== prior chip job $WAIT_PID exited $(date) ===" >> "$Q"
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
  now=$(date +%s); remaining=$(( HARD_END - now ))
  if [ "$remaining" -lt 900 ]; then
    echo "=== $name SKIPPED (only ${remaining}s left) $(date) ===" >> "$Q"
    return
  fi
  if [ "$tmo" -gt "$remaining" ]; then tmo=$remaining; fi
  echo "=== $name start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name done rc=$? $(date) ===" >> "$Q"
}

run_stage probe_forward_real 2400 python -u scripts/probe_forward_real.py

REAL_LAP=default
if grep -q "PROBE PASS" runs/probe_forward_real.log 2>/dev/null; then
  REAL_LAP=forward
fi
echo "=== real-output stages use laplacian=$REAL_LAP ===" >> "$Q"
# Pair probe already FAILED on this toolchain: twist runs use default.

run_stage diamond_twist_a 10800 python -u scripts/run_diamond_ccecp.py 3500 \
  /root/repo/runs/diamond_twist_a 0.25 0.25 0.25 kfac default
run_stage diamond_twist_b 10800 python -u scripts/run_diamond_ccecp.py 3500 \
  /root/repo/runs/diamond_twist_b 0.25 -0.25 0.25 kfac default

run_stage diamond_dmc 7200 python -u scripts/run_diamond_dmc.py \
  /root/repo/runs/diamond_twist_a 0.25 0.25 0.25 40 40 \
  /root/repo/runs/diamond_dmc 0.01

run_stage si_vmc3 9000 python -u scripts/run_si_vmc.py 3000 \
  /root/repo/runs/si_vmc3 "$REAL_LAP"

now=$(date +%s)
rem=$(( HARD_END - now - 600 ))
if [ "$rem" -gt 3600 ]; then
  iters=$(( rem * 3 / 10 ))
  run_stage c_fstream "$rem" python -u scripts/run_c_ccecp_kfac_fstream.py \
    "$iters" /root/repo/runs/c_kfac_fstream "$REAL_LAP"
else
  echo "=== c_fstream SKIPPED (rem=${rem}s) $(date) ===" >> "$Q"
fi

echo "=== queue_r2m2 finished $(date) ===" >> "$Q"
