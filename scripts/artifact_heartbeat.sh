#!/bin/bash
# Artifact heartbeat: every INTERVAL seconds, export the latest checkpoints
# of the named runs into artifacts/ and pathspec-commit them. Complements the
# per-leg commits in the queue scripts: a box swap mid-leg (legs are 90 min)
# otherwise loses up to a whole leg of chip time even though checkpoints land
# in runs/ every ~10 min (runs/ is gitignored and dies with the box).
#
# Checkpoint writes are atomic (write-to-tmp + rename), so copying mid-leg is
# safe. Commits are pathspec-scoped so concurrent git activity in the session
# is never swept in (ADVICE round-2 item).
#
# Usage: nohup bash scripts/artifact_heartbeat.sh <hard_end_epoch> [interval_s] &
set -u
cd /root/repo
HARD_END="${1:?hard_end epoch required}"
INTERVAL="${2:-900}"
Q=/root/repo/runs/artifact_heartbeat.log
mkdir -p runs
echo "=== heartbeat start $(date) interval=${INTERVAL}s ===" >> "$Q"
# Only export runs whose newest checkpoint advanced >= MIN_ADVANCE steps over
# what artifacts/ already holds (ADVICE round-3: a 900s cadence vs a ~10-min
# checkpoint cadence committed a fresh 67 MB blob nearly every tick — GBs of
# permanent history per session). The per-leg queue commits still capture leg
# boundaries regardless.
MIN_ADVANCE="${3:-2000}"
step_of() {  # newest checkpoint step in a dir, numeric; empty if none
  ls "$1"/qmcjax_ckpt_*.npz 2>/dev/null | sed 's/.*_0*\([0-9][0-9]*\)\.npz/\1/' \
    | sort -n | tail -1
}
while [ "$(date +%s)" -lt "$HARD_END" ]; do
  sleep "$INTERVAL"
  due=()
  for d in runs/*/; do
    name=$(basename "$d")
    new=$(step_of "runs/$name"); [ -n "$new" ] || continue
    old=$(step_of "artifacts/$name"); old="${old:-0}"
    [ "$(( new - old ))" -ge "$MIN_ADVANCE" ] && due+=("$name")
  done
  [ "${#due[@]}" -eq 0 ] && continue
  bash scripts/export_artifacts.sh "${due[@]}" >> "$Q" 2>&1
  # Keep only the 2 newest checkpoints per run in the working tree (the big
  # flagship ckpts are 67 MB each; an unpruned 15-min cadence would grow the
  # tree by GBs over a session). History still holds old blobs — that's fine.
  # Numeric sort on the step field (lexicographic misorders past 999,999).
  for d in artifacts/*/; do
    ls "$d"qmcjax_ckpt_*.npz 2>/dev/null | sort -V | head -n -2 | \
      while read -r f; do
        git rm -q --cached "$f" 2>/dev/null || true
        rm -f "$f"
      done
  done
  if ! git diff --quiet -- artifacts 2>/dev/null || \
     [ -n "$(git status --porcelain -- artifacts 2>/dev/null)" ]; then
    git add artifacts >> "$Q" 2>&1 && \
      git commit -q -m "Heartbeat: export run artifacts" -- artifacts \
        >> "$Q" 2>&1 || true
    echo "=== committed $(date) ===" >> "$Q"
  fi
done
echo "=== heartbeat end $(date) ===" >> "$Q"
