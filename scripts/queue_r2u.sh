#!/bin/bash
# Queue r2u: C2 dimer campaign (the reference's flagship molecule) after the
# wide-arm DMC (queue r2t) frees the chip. Wedge-tolerant legged training
# (csv-staleness watchdog, restore-and-continue) like queue_r2s, then DMC
# with the forward kinetic (probe green on this toolchain), reserving the
# DMC budget out of HARD_END.
#
# Usage: nohup bash scripts/queue_r2u.sh <hard_end_epoch> [wait_pid] &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_r2u.log
HARD_END="${1:?hard_end epoch required}"
WAIT_PID="${2:-}"
SAVE=/root/repo/runs/c2_kfac
CSV="$SAVE/train_states.csv"
STALE_S=900
LEG_S=5400
DMC_RESERVE=6600   # 5400s DMC + margin
echo "=== queue_r2u start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== wait_pid $WAIT_PID exited $(date) ===" >> "$Q"
fi

tpu_ok () {
  timeout 180 python -c "import jax; jax.devices(); import jax.numpy as jnp; jnp.ones(4).sum().block_until_ready()" > /dev/null 2>&1
}

leg=0
while true; do
  now=$(date +%s)
  remaining=$(( HARD_END - now - DMC_RESERVE ))
  [ "$remaining" -lt 900 ] && break
  if ! tpu_ok; then
    echo "=== tpu down, waiting $(date) ===" >> "$Q"
    sleep 120
    continue
  fi
  leg=$(( leg + 1 ))
  tmo=$LEG_S
  [ "$tmo" -gt "$remaining" ] && tmo=$remaining
  echo "=== c2 leg $leg start tmo=${tmo}s $(date) ===" >> "$Q"
  # iterations := tmo (at ~1 it/s the timeout/watchdog ends the leg either
  # way; restore-and-continue picks up from the last ~10-min checkpoint).
  python -u scripts/run_c2_ccecp_kfac.py "$tmo" "$SAVE" \
    > "runs/c2_leg${leg}.log" 2>&1 &
  PID=$!
  START=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    if [ $(( now - START )) -gt "$tmo" ]; then
      echo "=== c2 leg $leg TIMEOUT, killing $(date) ===" >> "$Q"
      kill "$PID" 2>/dev/null; sleep 10; kill -9 "$PID" 2>/dev/null
      break
    fi
    # Staleness is measured against the LATER of the csv mtime and this
    # leg's start: a csv left old by a previous leg must not count against
    # a fresh leg still in its (minutes-long) restore+compile phase — that
    # exact bug killed legs 2-18 of the 2026-08-19 C2 window ~60s after
    # launch ("csv 2302s old").
    ref=$START
    if [ -f "$CSV" ]; then
      m=$(stat -c %Y "$CSV")
      [ "$m" -gt "$ref" ] && ref=$m
    fi
    age=$(( now - ref ))
    if [ "$age" -gt "$STALE_S" ]; then
      echo "=== c2 leg $leg STALLED (csv ${age}s old), killing $(date) ===" >> "$Q"
      kill "$PID" 2>/dev/null; sleep 10; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
  echo "=== c2 leg $leg ended $(date) ===" >> "$Q"
  # Persist every leg: box swaps wipe runs/, only committed artifacts survive.
  bash scripts/export_artifacts.sh c2_kfac >> "$Q" 2>&1
  # Pathspec commit (see queue_r2s.sh): don't sweep unrelated staged changes.
  git add artifacts/c2_kfac >> "$Q" 2>&1 && \
    git commit -q -m "Checkpoint C2 leg $leg artifacts" \
      -- artifacts/c2_kfac >> "$Q" 2>&1 || true
done

now=$(date +%s)
dmc_tmo=$(( HARD_END - now - 1200 ))
if [ "$dmc_tmo" -gt 900 ]; then
  [ "$dmc_tmo" -gt 5400 ] && dmc_tmo=5400
  echo "=== c2_dmc start tmo=${dmc_tmo}s $(date) ===" >> "$Q"
  timeout "$dmc_tmo" python -u scripts/run_c2_ccecp_dmc.py \
    "$SAVE" 60 40 /root/repo/runs/c2_dmc 0.02 forward \
    > runs/c2_dmc.log 2>&1
  echo "=== c2_dmc done rc=$? $(date) ===" >> "$Q"
else
  echo "=== c2_dmc SKIPPED (${dmc_tmo}s left) $(date) ===" >> "$Q"
fi

bash scripts/export_artifacts.sh c2_kfac c2_dmc >> "$Q" 2>&1
git add artifacts/c2_kfac artifacts/c2_dmc >> "$Q" 2>&1 && \
  git commit -q -m "C2 campaign artifacts" \
    -- artifacts/c2_kfac artifacts/c2_dmc >> "$Q" 2>&1 || true
echo "=== queue_r2u finished $(date) ===" >> "$Q"
