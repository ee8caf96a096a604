#!/bin/bash
# Post-fix physics queue (2026-08-18, after queue_r2n): (a) re-run the diamond
# fixed-phase DMC with the repaired trial rebuild (train.network_from_config —
# the r2n run NaN'd because the hand-rolled make_ai_net call silently diverged
# on bounded_envelope/regular_harmonics) for BOTH trained twists, (b) continue
# the round-3 flagship f-stream arm (it already beats the 67k ainet plateau:
# -5.41698(5) at t=9.6k vs -5.41563(6)), (c) DMC from the continued f-stream
# trial, (d) export artifacts.
#
# Usage: nohup bash scripts/queue_r2o.sh <hard_end_epoch> [wait_pid] &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p runs
Q=/root/repo/runs/chip_queue_r2o.log
HARD_END="${1:?hard_end epoch required}"
WAIT_PID="${2:-}"
echo "=== queue_r2o start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

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

# --- (a) diamond fixed-phase DMC, repaired trial rebuild -------------------
run_stage diamond_dmc_a 4500 python -u scripts/run_diamond_dmc.py \
  /root/repo/runs/diamond_twist_a 0.25 0.25 0.25 40 40 \
  /root/repo/runs/diamond_dmc_a 0.01
run_stage diamond_dmc_b 4500 python -u scripts/run_diamond_dmc.py \
  /root/repo/runs/diamond_twist_b 0.25 -0.25 0.25 40 40 \
  /root/repo/runs/diamond_dmc_b 0.01

# --- (b) continue the f-stream flagship (restore scans save_path) ----------
# Reserve 70 min for the final DMC + 15 min margin; ~1.8 it/s at batch 4096
# with the forward Laplacian (r2n gate: real=forward on this toolchain).
now=$(date +%s)
rem=$(( HARD_END - now - 5100 ))
if [ "$rem" -gt 1800 ]; then
  iters=$(( rem * 18 / 10 ))
  run_stage c_fstream2 "$rem" python -u scripts/run_c_ccecp_kfac_fstream.py \
    "$iters" /root/repo/runs/c_kfac_fstream forward
else
  echo "=== c_fstream2 SKIPPED (rem=${rem}s) $(date) ===" >> "$Q"
fi

# --- (c) DMC from the continued f-stream trial (EMA auto-detected) ---------
run_stage c_dmc_fstream 4200 python -u scripts/run_c_ccecp_dmc_big.py \
  /root/repo/runs/c_kfac_fstream 60 40 /root/repo/runs/c_dmc_fstream 0.02 \
  ferminet

# --- (d) survive the next box swap -----------------------------------------
bash scripts/export_artifacts.sh >> "$Q" 2>&1
echo "=== queue_r2o finished $(date) ===" >> "$Q"
