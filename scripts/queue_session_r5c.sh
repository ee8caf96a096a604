#!/bin/bash
# Round-5 part B (run after queue_session_r5b.sh): HEG rs=1 FRESH restart
# with the new Gamma plane-wave pretraining (the round-5 flatline diagnosis:
# no jellium pretraining path -> random determinant ~7 Ha above HF, KFAC
# crawl at ~0.2 mHa/iter; fresh dir runs/heg_rs1b, old trace kept as the
# before/after comparison) -> published-form flagship arm legs (VERDICT r4
# item 1) until the hard end. Trust gate is assumed PASSED by part A.
#
# Usage: bash scripts/queue_session_r5c.sh <hard_end_epoch> [heg_iters]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_r5c.log
HARD_END="${1:?hard_end epoch required}"
HEG_ITERS="${2:-3000}"
STALL_S="${STALL_S:-1200}"
mkdir -p runs
. scripts/watchdog_lib.sh
echo "=== queue_r5c start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

left() { echo $(( HARD_END - $(date +%s) )); }

export_commit() {
  bash scripts/export_artifacts.sh "$1" >> "$Q" 2>&1
  git add "artifacts/$1" 2>/dev/null && \
    git commit -q -m "$2" -- "artifacts/$1" 2>/dev/null || true
}

# --- stage 1: HEG rs=1 fresh start with plane-wave pretraining ---
# HEG_ITERS=0 skips this stage (pubform-only mode: the HEG fix is validated
# on CPU while pubform holds the chip; a separate part-C queue then runs HEG).
if [ "$HEG_ITERS" -gt 0 ] && [ "$(left)" -ge 3000 ]; then
  tmo=7200; [ "$tmo" -gt "$(( $(left) - 600 ))" ] && tmo=$(( $(left) - 600 ))
  echo "=== heg fresh (pretrained, $HEG_ITERS iters) start tmo=${tmo}s $(date) ===" >> "$Q"
  watched "$tmo" runs/heg_rs1b.log runs/heg_rs1b \
    python -u scripts/run_heg.py "$HEG_ITERS" /root/repo/runs/heg_rs1b \
    1.0 forward 2048 500
  echo "=== heg fresh ended rc=$? $(date) ===" >> "$Q"
  grep -E "HF anchor|FINAL|correlation" runs/heg_rs1b.log >> "$Q" || true
  export_commit heg_rs1b "HEG rs=1 fresh run with plane-wave pretraining (r5c)"
fi

# --- stage 2: published-form flagship legs until the hard end ---
leg=0
while true; do
  now=$(date +%s); remaining=$(( HARD_END - now ))
  [ "$remaining" -lt 1200 ] && break
  leg=$(( leg + 1 )); tmo=5400; [ "$tmo" -gt "$(( remaining - 120 ))" ] && tmo=$(( remaining - 120 ))
  echo "=== c_pubform leg $leg start tmo=${tmo}s $(date) ===" >> "$Q"
  watched "$tmo" "runs/c_pubform_r5c_leg${leg}.log" runs/c_pubform \
    python -u scripts/run_c_ccecp_kfac_fstream.py 99999 \
    /root/repo/runs/c_pubform forward 16 256 off isotropic
  echo "=== c_pubform leg $leg ended rc=$? $(date) ===" >> "$Q"
  export_commit c_pubform "Checkpoint published-form flagship arm leg $leg (r5c)"
  gate=$(python scripts/gate_pubform.py 20 4000 2>> "$Q")
  echo "=== pubform gate: $gate ===" >> "$Q"
done
echo "=== queue_r5c finished $(date) ===" >> "$Q"
