#!/bin/bash
# Round-5 fresh-box part A: trust gate -> artifact restore -> Li excited
# continuation to t=6000 (VERDICT r4 item 6) -> C2 frozen-eval AD-SWCT
# forces oracle (VERDICT r4 item 7). Part B (HEG fresh restart with the
# plane-wave pretraining fix + pubform flagship legs) is launched separately
# once this exits — the HEG fix needs CPU-side validation first, and the
# split keeps every stage under the wedge watchdog with a bounded budget.
#
# Usage: bash scripts/queue_session_r5b.sh <hard_end_epoch>
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_r5b.log
HARD_END="${1:?hard_end epoch required}"
STALL_S="${STALL_S:-1200}"
mkdir -p runs
. scripts/watchdog_lib.sh
echo "=== queue_r5b start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

left() { echo $(( HARD_END - $(date +%s) )); }

export_commit() {
  bash scripts/export_artifacts.sh "$1" >> "$Q" 2>&1
  git add "artifacts/$1" 2>/dev/null && \
    git commit -q -m "$2" -- "artifacts/$1" 2>/dev/null || true
}

# --- stage 1: backend trust gate (MANDATORY on any new box/toolchain) ---
GATE_OK=0
for attempt in 1 2 3; do
  watched 2400 "runs/probe_trust_r5b_a${attempt}.log" /tmp/jaxcache \
    python -u scripts/probe_el_cross_device.py
  grep -q "CROSS-DEVICE PASS" "runs/probe_trust_r5b_a${attempt}.log" && { GATE_OK=1; break; }
  echo "=== trust gate attempt $attempt failed/wedged $(date) ===" >> "$Q"
done
[ "$GATE_OK" -ne 1 ] && { echo "=== TRUST GATE FAILED — no physics ===" >> "$Q"; exit 1; }
echo "=== trust gate PASS $(date) ===" >> "$Q"

# --- stage 2: restore runs/ from committed artifacts (box swap wiped runs/) ---
for run in c_pubform c_noy c_kfac_fstream c_kfac_wide c2_kfac heg_rs1 \
           li_excited_full; do
  [ -d "artifacts/$run" ] || continue
  have=$(ls "runs/$run"/qmcjax_ckpt_*.npz 2>/dev/null | sort -V | tail -1)
  last=$(ls "artifacts/$run"/qmcjax_ckpt_*.npz 2>/dev/null | sort -V | tail -1)
  [ -n "$last" ] || continue
  if [ -z "$have" ] || [ "$(basename "$last")" \> "$(basename "$have")" ]; then
    mkdir -p "runs/$run" && cp "$last" "runs/$run/" && \
      echo "=== restored $run from $(basename "$last") ===" >> "$Q"
  fi
done

# --- stage 3: Li excited continuation to t=6000 ---
li_t=$(ls runs/li_excited_full/qmcjax_ckpt_*.npz 2>/dev/null | sort -V \
       | sed 's/.*_0*\([0-9][0-9]*\)\.npz/\1/' | tail -1)
if [ "${li_t:-0}" -lt 5500 ] && [ "$(left)" -ge 2400 ]; then
  want=$(( 6000 - ${li_t:-0} )); tmo=5400; [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  echo "=== li continuation (+$want from t=${li_t:-0}) start tmo=${tmo}s $(date) ===" >> "$Q"
  watched "$tmo" runs/li_excited_r5b.log runs/li_excited_full \
    python -u scripts/run_li_excited_full.py "$want" 2048 \
    /root/repo/runs/li_excited_full
  echo "=== li continuation ended rc=$? $(date) ===" >> "$Q"
  grep -E "SUMMARY|EXCIT|S2|OSC" runs/li_excited_r5b.log >> "$Q" || true
  export_commit li_excited_full "Li excited continuation artifacts (r5b)"
fi

# --- stage 4: C2 frozen-eval AD-SWCT forces oracle (equilibrium bond) ---
if [ "$(left)" -ge 1500 ]; then
  tmo=3300; [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  echo "=== c2 forces start tmo=${tmo}s $(date) ===" >> "$Q"
  watched "$tmo" runs/c2_forces_r5b.log runs/c2_forces \
    python -u scripts/run_c2_forces.py /root/repo/runs/c2_kfac 400 1024 \
    /root/repo/runs/c2_forces 2.348
  echo "=== c2 forces ended rc=$? $(date) ===" >> "$Q"
  grep -E "FROZEN|FORCE|force" runs/c2_forces_r5b.log >> "$Q" || true
  export_commit c2_forces "C2 equilibrium-bond AD-SWCT forces artifacts (r5b)"
fi
echo "=== queue_r5b finished $(date) ===" >> "$Q"
