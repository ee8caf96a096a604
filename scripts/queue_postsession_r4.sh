#!/bin/bash
# Round-4 post-session window: runs once queue_session_r4 exits (chip free).
#
#   1. FULL CPU test suite, chip idle (VERDICT round-3 weak #1 / item 5 —
#      never run it concurrently with a chip leg: the r2q futex-wedge history);
#   2. HEG showcase (VERDICT item 4): 14e Gamma closed shell, multiwave
#      envelope, S(k) observable, exact plane-wave HF anchor in the log;
#   3. no-Y ablation arm (flagship root-cause probe): the trajectory fits put
#      BOTH flagship arms' asymptotes ~7 mHa above published -5.4254, so the
#      bar is recipe-level; the Y_nlm factor is the last structural delta.
#      Legged with per-leg artifact commits until hard end.
#
# Usage: nohup bash scripts/queue_postsession_r4.sh <hard_end_epoch> &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_post_r4.log
HARD_END="${1:?hard_end epoch required}"
mkdir -p runs
echo "=== post-session queue armed $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

# Wait for the session queue (and any chip leg it spawned) to finish.
QPID=$(cat /tmp/queue_r4.pid 2>/dev/null || echo "")
while [ -n "$QPID" ] && kill -0 "$QPID" 2>/dev/null; do sleep 60; done
echo "=== session queue exited, post-session start $(date) ===" >> "$Q"

# --- stage 1: full CPU test suite (chip idle) ---
timeout 6000 python -m pytest tests/ -q > runs/pytest_full_r4.log 2>&1
tail -3 runs/pytest_full_r4.log >> "$Q"
cp runs/pytest_full_r4.log artifacts/pytest_full_r4.log
git add artifacts/pytest_full_r4.log 2>/dev/null && \
  git commit -q -m "Round-4 full-suite run log" \
    -- artifacts/pytest_full_r4.log 2>/dev/null || true

# --- stage 1b: frozen EMA eval of the wide arm (pins the flagship number) ---
now=$(date +%s)
if [ $(( HARD_END - now )) -ge 2400 ]; then
  echo "=== wide-arm frozen EMA eval start $(date) ===" >> "$Q"
  timeout 2700 python -u scripts/eval_frozen_c.py /root/repo/runs/c_kfac_wide \
    600 2048 ferminet 512 16 forward ema > runs/eval_wide_ema.log 2>&1
  grep "FROZEN EVAL" runs/eval_wide_ema.log >> "$Q" || \
    echo "=== wide eval produced no result (rc/wedge) ===" >> "$Q"
fi

# --- stage 2: HEG showcase ---
now=$(date +%s); remaining=$(( HARD_END - now - 1200 ))
if [ "$remaining" -ge 2400 ]; then
  tmo=4500; [ "$tmo" -gt "$remaining" ] && tmo=$remaining
  echo "=== heg start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" python -u scripts/run_heg.py 6000 /root/repo/runs/heg_rs1 \
    1.0 forward 2048 > runs/heg_rs1.log 2>&1
  echo "=== heg done rc=$? $(date) ===" >> "$Q"
  bash scripts/export_artifacts.sh heg_rs1 >> "$Q" 2>&1
  git add artifacts/heg_rs1 2>/dev/null && \
    git commit -q -m "HEG rs=1 showcase artifacts" \
      -- artifacts/heg_rs1 2>/dev/null || true
fi

# --- stage 3: no-Y ablation arm, legged until hard end ---
leg=0
while true; do
  now=$(date +%s); remaining=$(( HARD_END - now ))
  [ "$remaining" -lt 1500 ] && break
  leg=$(( leg + 1 )); tmo=5400; [ "$tmo" -gt "$remaining" ] && tmo=$remaining
  echo "=== noy leg $leg start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" python -u scripts/run_c_ccecp_kfac_fstream.py 99999 \
    /root/repo/runs/c_noy forward 16 256 off > "runs/c_noy_leg${leg}.log" 2>&1
  echo "=== noy leg $leg ended rc=$? $(date) ===" >> "$Q"
  bash scripts/export_artifacts.sh c_noy >> "$Q" 2>&1
  git add artifacts/c_noy 2>/dev/null && \
    git commit -q -m "Checkpoint no-Y ablation arm leg $leg" \
      -- artifacts/c_noy 2>/dev/null || true
done
echo "=== post-session queue finished $(date) ===" >> "$Q"
