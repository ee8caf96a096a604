#!/bin/bash
# Queue r2q: the WIDE flagship arm. The f-stream (256,32)x4/16det run
# plateaus at -5.4175 by t~40k (0.07 mHa over 6.5k iters — lr-decay-slow,
# extrapolates to ~770k iters for the published -5.4254, which itself uses a
# 2x-WIDER net). Structural lever: (512,32)x4, 16 dets, batch 4096, fresh
# save dir. First leg this queue; restore-and-continue across rounds like
# the f-stream arm (EMA + artifact export make that safe).
#
# Usage: nohup bash scripts/queue_r2q.sh <hard_end_epoch> &
#        echo $! > /tmp/queue_r2q.pid
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_r2q.log
HARD_END="${1:?hard_end epoch required}"
echo "=== queue_r2q start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

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

now=$(date +%s)
train_budget=$(( HARD_END - now - 1200 ))
# ~1 it/s expected at 2x width (f-stream measured 1.5-1.9 it/s at 256);
# iterations only set the loop bound — the timeout is the real clamp and
# checkpoints land every 10 min.
iters=$(( train_budget ))
run_stage c_wide1 "$train_budget" python -u \
  scripts/run_c_ccecp_kfac_fstream.py "$iters" /root/repo/runs/c_kfac_wide \
  forward 16 512

bash scripts/export_artifacts.sh c_kfac_wide c_kfac_fstream >> "$Q" 2>&1
echo "=== queue_r2q finished $(date) ===" >> "$Q"
