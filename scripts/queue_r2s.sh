#!/bin/bash
# Queue r2s: wide flagship arm, WEDGE-TOLERANT edition. The c_wide1 leg
# froze mid-training (host futex wait, healthy tunnel) and a single long
# stage would have burned hours of chip on a dead process. This queue runs
# training as a loop of legs, each watched by a csv-staleness monitor: no
# new train_states.csv row for STALE_S seconds -> kill the leg (checkpoints
# land every ~10 min, restore-and-continue loses almost nothing) and start
# the next leg.
#
# Usage: nohup bash scripts/queue_r2s.sh <hard_end_epoch> [wait_pid] &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_r2s.log
HARD_END="${1:?hard_end epoch required}"
WAIT_PID="${2:-}"
SAVE=/root/repo/runs/c_kfac_wide
CSV="$SAVE/train_states.csv"
STALE_S=900      # compile+pretrain can take ~6 min before the first row
LEG_S=5400
echo "=== queue_r2s start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "=== wait_pid $WAIT_PID exited $(date) ===" >> "$Q"
fi

tpu_ok () {
  timeout 180 python -c "import jax; jax.devices(); import jax.numpy as jnp; jnp.ones(4).sum().block_until_ready()" > /dev/null 2>&1
}

leg=0
while true; do
  now=$(date +%s)
  remaining=$(( HARD_END - now - 1500 ))
  [ "$remaining" -lt 900 ] && break
  if ! tpu_ok; then
    echo "=== tpu down, waiting $(date) ===" >> "$Q"
    sleep 120
    continue
  fi
  leg=$(( leg + 1 ))
  tmo=$LEG_S
  [ "$tmo" -gt "$remaining" ] && tmo=$remaining
  echo "=== wide leg $leg start tmo=${tmo}s $(date) ===" >> "$Q"
  python -u scripts/run_c_ccecp_kfac_fstream.py "$tmo" "$SAVE" \
    forward 16 512 > "runs/c_wide_leg${leg}.log" 2>&1 &
  PID=$!
  START=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    if [ $(( now - START )) -gt "$tmo" ]; then
      echo "=== leg $leg TIMEOUT, killing $(date) ===" >> "$Q"
      kill "$PID" 2>/dev/null; sleep 10; kill -9 "$PID" 2>/dev/null
      break
    fi
    # Baseline = later of csv mtime and leg start: an old csv from a prior
    # leg must not kill a fresh leg mid-compile (2026-08-19 C2 incident).
    ref=$START
    if [ -f "$CSV" ]; then
      m=$(stat -c %Y "$CSV")
      [ "$m" -gt "$ref" ] && ref=$m
    fi
    age=$(( now - ref ))
    if [ "$age" -gt "$STALE_S" ]; then
      echo "=== leg $leg STALLED (csv ${age}s old), killing $(date) ===" >> "$Q"
      kill "$PID" 2>/dev/null; sleep 10; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
  echo "=== wide leg $leg ended $(date) ===" >> "$Q"
  # Box swaps wipe runs/ — only committed artifacts survive. Persist every
  # leg's last checkpoint immediately (2026-08-19: lost t~5k..14k this way).
  bash scripts/export_artifacts.sh c_kfac_wide >> "$Q" 2>&1
  # Pathspec commit: this fires from a background queue concurrent with other
  # git activity — a bare `git commit` would sweep unrelated staged changes in.
  git add artifacts/c_kfac_wide >> "$Q" 2>&1 && \
    git commit -q -m "Checkpoint wide-arm leg $leg artifacts" \
      -- artifacts/c_kfac_wide >> "$Q" 2>&1 || true
done

bash scripts/export_artifacts.sh c_kfac_wide >> "$Q" 2>&1
echo "=== queue_r2s finished $(date) ===" >> "$Q"
