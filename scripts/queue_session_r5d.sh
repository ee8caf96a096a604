#!/bin/bash
# Round-5 part C (after the part-B pubform leg): HEG rs=1 fresh run with the
# corrected homogeneous-gas recipe (plane-wave pretraining, no origin-
# anchored structures — commit 9b73742), then the C2 forces retry at batch
# 256 (the batch-1024 AD-SWCT Jacobian needs 37.4G HBM vs 15.75G — compile-
# time OOM, runs/c2_forces_r5b.log).
#
# Usage: bash scripts/queue_session_r5d.sh <hard_end_epoch> [heg_iters]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_r5d.log
HARD_END="${1:?hard_end epoch required}"
HEG_ITERS="${2:-1800}"
STALL_S="${STALL_S:-1200}"
mkdir -p runs
. scripts/watchdog_lib.sh
echo "=== queue_r5d start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

left() { echo $(( HARD_END - $(date +%s) )); }

export_commit() {
  bash scripts/export_artifacts.sh "$1" >> "$Q" 2>&1
  git add "artifacts/$1" 2>/dev/null && \
    git commit -q -m "$2" -- "artifacts/$1" 2>/dev/null || true
}

# --- stage 1: HEG rs=1, corrected recipe, fresh dir ---
if [ "$(left)" -ge 3000 ]; then
  tmo=4100; [ "$tmo" -gt "$(( $(left) - 2700 ))" ] && tmo=$(( $(left) - 2700 ))
  [ "$tmo" -lt 3000 ] && tmo=3000
  echo "=== heg fixed-recipe ($HEG_ITERS iters) start tmo=${tmo}s $(date) ===" >> "$Q"
  watched "$tmo" runs/heg_rs1b.log runs/heg_rs1b \
    python -u scripts/run_heg.py "$HEG_ITERS" /root/repo/runs/heg_rs1b \
    1.0 forward 2048 800
  echo "=== heg ended rc=$? $(date) ===" >> "$Q"
  grep -E "HF anchor|FINAL|correlation" runs/heg_rs1b.log >> "$Q" || true
  export_commit heg_rs1b "HEG rs=1 corrected-recipe run artifacts (r5d)"
fi

# --- stage 2: C2 forces retry at batch 256 ---
if [ "$(left)" -ge 1800 ]; then
  tmo=$(( $(left) - 180 )); [ "$tmo" -gt 4200 ] && tmo=4200
  echo "=== c2 forces (batch 256) start tmo=${tmo}s $(date) ===" >> "$Q"
  watched "$tmo" runs/c2_forces_r5d.log runs/c2_forces \
    python -u scripts/run_c2_forces.py /root/repo/runs/c2_kfac 1200 256 \
    /root/repo/runs/c2_forces 2.348
  echo "=== c2 forces ended rc=$? $(date) ===" >> "$Q"
  grep -E "FROZEN|FORCE|force" runs/c2_forces_r5d.log >> "$Q" || true
  export_commit c2_forces "C2 equilibrium-bond AD-SWCT forces, batch 256 (r5d)"
fi
echo "=== queue_r5d finished $(date) ===" >> "$Q"
