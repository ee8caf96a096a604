#!/bin/bash
# Round-5 part C (final chip window). Reallocated 02:20 UTC on measured
# evidence (runs/chip_queue_r5c.log, /tmp/heg_fit_diag.log -> BASELINE):
#   * pubform runs at ~0.93 it/s (3x the estimate) and reached the wide
#     arm's committed trace mid-leg — one more full leg pushes it INTO the
#     f-stream arm's own trace region (t >= 9579) for a direct matched-t
#     flagship comparison (VERDICT r4 item 1's measured deliverable);
#   * the corrected HEG recipe's plane-wave pretraining plateaus at orbital
#     MSE ~0.165 with E_L median ~52 Ha on CPU — a chip window would start
#     there and crawl; the HEG close-out this round is the root-cause
#     writeup + the HF-anchor oracle, not a VMC row;
#   * C2 forces retry at batch 256 (batch-1024 Jacobian OOMed at compile:
#     37.4G vs 15.75G HBM).
#
# Usage: bash scripts/queue_session_r5d.sh <hard_end_epoch> [pubform_end_epoch]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_r5d.log
HARD_END="${1:?hard_end epoch required}"
PUBFORM_END="${2:-$(( HARD_END - 3000 ))}"
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

# --- stage 1: pubform leg 2 (cached compile; runs until PUBFORM_END) ---
tmo=$(( PUBFORM_END - $(date +%s) ))
if [ "$tmo" -ge 900 ]; then
  echo "=== c_pubform leg 2 start tmo=${tmo}s $(date) ===" >> "$Q"
  watched "$tmo" runs/c_pubform_r5d_leg2.log runs/c_pubform \
    python -u scripts/run_c_ccecp_kfac_fstream.py 99999 \
    /root/repo/runs/c_pubform forward 16 256 off isotropic
  echo "=== c_pubform leg 2 ended rc=$? $(date) ===" >> "$Q"
  export_commit c_pubform "Checkpoint published-form flagship arm leg 2 (r5d)"
  gate=$(python scripts/gate_pubform.py 20 4000 2>> "$Q")
  echo "=== pubform gate: $gate ===" >> "$Q"
fi

# --- stage 2: C2 forces retry at batch 256 ---
if [ "$(left)" -ge 1500 ]; then
  tmo=$(( $(left) - 180 ))
  echo "=== c2 forces (batch 256) start tmo=${tmo}s $(date) ===" >> "$Q"
  watched "$tmo" runs/c2_forces_r5d.log runs/c2_forces \
    python -u scripts/run_c2_forces.py /root/repo/runs/c2_kfac 1200 256 \
    /root/repo/runs/c2_forces 2.348
  echo "=== c2 forces ended rc=$? $(date) ===" >> "$Q"
  grep -E "FROZEN|FORCE|force" runs/c2_forces_r5d.log >> "$Q" || true
  export_commit c2_forces "C2 equilibrium-bond AD-SWCT forces, batch 256 (r5d)"
fi
echo "=== queue_r5d finished $(date) ===" >> "$Q"
