#!/bin/bash
# Chip queue, part 10: automated decision-tree continuation.
# Waits for queue_r2j (probe stages) to exit, then:
#   1. psiformer chip probe — validates arm D's compile/step on the real TPU
#      (fresh ansatz class; 250 iters, ~15 min)
#   2. scripts/decide_r3_arm.py reads the r2j probe CSVs and picks the arm
#   3. runs the winning continuation until the hard end (checkpoints every
#      ~10 min make a timeout-kill lossless)
# Usage: nohup bash scripts/queue_r2k.sh <hard_end_epoch> <wait_pid> &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue10.log
HARD_END="${1:?hard_end epoch}"
WAIT_PID="${2:-}"
echo "=== queue_r2k start $(date) hard_end=$(date -d @$HARD_END) wait=${WAIT_PID} ===" >> "$Q"

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== prior queue ($WAIT_PID) exited $(date) ===" >> "$Q"
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
    return 1
  fi
  local now remaining
  now=$(date +%s); remaining=$(( HARD_END - now ))
  if [ "$remaining" -lt 900 ]; then
    echo "=== $name SKIPPED (only ${remaining}s left) $(date) ===" >> "$Q"
    return 1
  fi
  if [ "$tmo" -gt "$remaining" ]; then tmo=$remaining; fi
  echo "=== $name start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  local rc=$?
  echo "=== $name done rc=$rc $(date) ===" >> "$Q"
  return 0
}

# Stage 1: psiformer on-chip probe (arm D validation; informs round 3 even if
# another arm wins today).
run_stage c_psiformer_probe 2400 python -u scripts/run_c_ccecp_psiformer.py \
  250 /root/repo/runs/c_psiformer_probe

# Stage 2: pick the arm from the r2j probe results.
ARM=$(python scripts/decide_r3_arm.py 2>> "$Q")
echo "=== decide_r3_arm -> ${ARM} $(date) ===" >> "$Q"

# Stage 3: run the winning continuation to the horizon. All stages checkpoint
# every ~10 min, so the timeout kill loses nothing.
NOW=$(date +%s); BUDGET=$(( HARD_END - NOW - 600 ))
if [ "$BUDGET" -gt 1800 ]; then
  case "$ARM" in
    lrboost)
      # ~0.55 it/s -> size the iteration ask to the wall budget.
      ITERS=$(( BUDGET / 2 ))
      run_stage c_kfac_lrboost_cont "$BUDGET" python -u \
        scripts/run_c_ccecp_kfac_big.py "$ITERS" \
        /root/repo/runs/c_kfac_lrboost 0.05 10000 /root/repo/runs/c_kfac_big
      ;;
    spring)
      # ~1.5 it/s at batch 1024.
      ITERS=$(( BUDGET * 5 / 4 ))
      run_stage c_spring_cont "$BUDGET" python -u \
        scripts/run_c_spring_big.py "$ITERS" \
        /root/repo/runs/c_spring_cont /root/repo/runs/c_kfac_big 0.1 0.01 0.99
      ;;
    *)
      # Fresh fstream flagship (~0.3 it/s at batch 4096); partial progress is
      # still a round-3 head start via restore-and-continue.
      ITERS=$(( BUDGET * 3 / 10 ))
      run_stage c_kfac_fstream "$BUDGET" python -u \
        scripts/run_c_ccecp_kfac_fstream.py "$ITERS" \
        /root/repo/runs/c_kfac_fstream
      ;;
  esac
else
  echo "=== continuation SKIPPED (budget ${BUDGET}s) $(date) ===" >> "$Q"
fi

echo "=== queue_r2k finished $(date) ===" >> "$Q"
