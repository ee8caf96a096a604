#!/bin/bash
# Round-6 session bootstrap (fresh-box safe): trust gate -> restore from
# committed artifacts -> flagship continuation with the matched-t decision
# gate -> the remaining physics queue. Everything chip-side runs under the
# wedge watchdog (scripts/watchdog_lib.sh; round-5 addition).
#
# Stage order encodes the round-5 close-out state:
#   3. FLAGSHIP: continue runs/c_pubform (published-FermiNet orbital form;
#      ~0.3 it/s -> the -5.425 bar needs ~30k+ iterations, i.e. most of a
#      round of chip time); scripts/gate_pubform.py can switch the window to
#      the c_noy attribution arm on a measured refutation.
#   4. C2 VMC trial extension t -> 20k+, then 5. a FRESH C2 DMC (new nodes).
#   6. HEG rs=1 to t=6000 if the round-5 post-session window fell short.
#   7. Li excited continuation to t=6000 if still short.
#
# Usage: nohup bash scripts/queue_session_r6.sh <hard_end_epoch> &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_session_r6.log
HARD_END="${1:?hard_end epoch required}"
STALL_S="${STALL_S:-1500}"
mkdir -p runs
. scripts/watchdog_lib.sh
echo "=== queue_session_r6 start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

left() { echo $(( HARD_END - $(date +%s) )); }

export_commit() {
  bash scripts/export_artifacts.sh "$1" >> "$Q" 2>&1
  git add "artifacts/$1" 2>/dev/null && \
    git commit -q -m "$2" -- "artifacts/$1" 2>/dev/null || true
}

# --- stage 1: backend trust gate (MANDATORY on any new box/toolchain) ---
GATE_OK=0
for attempt in 1 2 3; do
  watched 2400 "runs/probe_trust_r6_a${attempt}.log" /tmp/jaxcache \
    python -u scripts/probe_el_cross_device.py
  grep -q "CROSS-DEVICE PASS" "runs/probe_trust_r6_a${attempt}.log" && { GATE_OK=1; break; }
  echo "=== trust gate attempt $attempt failed/wedged $(date) ===" >> "$Q"
done
[ "$GATE_OK" -ne 1 ] && { echo "=== TRUST GATE FAILED — no physics ===" >> "$Q"; exit 1; }
echo "=== trust gate PASS ===" >> "$Q"

# --- stage 2: restore runs/ from committed artifacts (box swaps wipe runs/) ---
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

# --- stage 3: flagship window (gate-aware pubform continuation) ---
now=$(date +%s); FLAG_END=$(( now + ($(left)) * 5 / 10 ))
ARM=c_pubform; ARM_ARGS="off isotropic"; leg=0
while true; do
  now=$(date +%s); remaining=$(( FLAG_END - now ))
  [ "$remaining" -lt 1500 ] && break
  leg=$(( leg + 1 )); tmo=5400; [ "$tmo" -gt "$remaining" ] && tmo=$remaining
  echo "=== $ARM leg $leg start tmo=${tmo}s $(date) ===" >> "$Q"
  # shellcheck disable=SC2086
  watched "$tmo" "runs/${ARM}_r6_leg${leg}.log" "runs/$ARM" \
    python -u scripts/run_c_ccecp_kfac_fstream.py 99999 \
    "/root/repo/runs/$ARM" forward 16 256 $ARM_ARGS
  echo "=== $ARM leg $leg ended rc=$? $(date) ===" >> "$Q"
  export_commit "$ARM" "Checkpoint $ARM arm leg $leg (r6)"
  if [ "$ARM" = "c_pubform" ]; then
    gate=$(python scripts/gate_pubform.py 20 4000 2>> "$Q")
    echo "=== gate: $gate ===" >> "$Q"
    [ "$gate" = "SWITCH" ] && { ARM=c_noy; ARM_ARGS="off"; leg=0; }
  fi
done

# --- stage 4: C2 VMC extension legs ---
C2_END=$(( $(date +%s) + ($(left)) * 6 / 10 ))
leg=0
while true; do
  now=$(date +%s); remaining=$(( C2_END - now ))
  [ "$remaining" -lt 1500 ] && break
  leg=$(( leg + 1 )); tmo=5400; [ "$tmo" -gt "$remaining" ] && tmo=$remaining
  echo "=== c2 vmc leg $leg start tmo=${tmo}s $(date) ===" >> "$Q"
  watched "$tmo" "runs/c2_kfac_r6_leg${leg}.log" runs/c2_kfac \
    python -u scripts/run_c2_ccecp_kfac.py 99999 /root/repo/runs/c2_kfac
  echo "=== c2 vmc leg $leg ended rc=$? $(date) ===" >> "$Q"
  export_commit c2_kfac "Checkpoint C2 VMC extension leg $leg (r6)"
done

# --- stage 5: fresh C2 DMC from the extended trial (NEW save dir) ---
if [ "$(left)" -ge 4000 ]; then
  tmo=4500; [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  echo "=== c2 dmc (extended trial) start tmo=${tmo}s $(date) ===" >> "$Q"
  watched "$tmo" runs/c2_dmc_r6.log runs/c2_dmc_r6 \
    python -u scripts/run_c2_ccecp_dmc.py /root/repo/runs/c2_kfac \
    60 40 /root/repo/runs/c2_dmc_r6 0.02 forward 2.348 1024
  echo "=== c2 dmc done rc=$? $(date) ===" >> "$Q"
  export_commit c2_dmc_r6 "C2 DMC from extended trial (r6)"
fi

# --- stage 6: HEG on the CORRECTED recipe (round-5 root cause, commit
# 9b73742: homogeneous-gas config + plane-wave pretraining; the old
# runs/heg_rs1 flatline is origin-pinned — do NOT continue it) ---
heg_t=$(ls runs/heg_rs1b/qmcjax_ckpt_*.npz 2>/dev/null | sort -V \
        | sed 's/.*_0*\([0-9][0-9]*\)\.npz/\1/' | tail -1)
if [ "${heg_t:-0}" -lt 5500 ] && [ "$(left)" -ge 3000 ]; then
  want=$(( 6000 - ${heg_t:-0} )); tmo=5000; [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  echo "=== heg corrected-recipe (+$want) start tmo=${tmo}s $(date) ===" >> "$Q"
  watched "$tmo" runs/heg_rs1b_r6.log runs/heg_rs1b \
    python -u scripts/run_heg.py "$want" /root/repo/runs/heg_rs1b 1.0 forward 2048 2000
  echo "=== heg done rc=$? $(date) ===" >> "$Q"
  grep -E "HF anchor|FINAL|correlation" runs/heg_rs1b_r6.log >> "$Q" || true
  export_commit heg_rs1b "HEG rs=1 corrected-recipe artifacts (r6)"
fi

# --- stage 7: Li continuation to t=6000 if short ---
li_t=$(ls runs/li_excited_full/qmcjax_ckpt_*.npz 2>/dev/null | sort -V \
       | sed 's/.*_0*\([0-9][0-9]*\)\.npz/\1/' | tail -1)
if [ "${li_t:-0}" -lt 5500 ] && [ "$(left)" -ge 2400 ]; then
  want=$(( 6000 - ${li_t:-0} )); tmo=3000; [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  echo "=== li continuation (+$want) start tmo=${tmo}s $(date) ===" >> "$Q"
  watched "$tmo" runs/li_excited_r6.log runs/li_excited_full \
    python -u scripts/run_li_excited_full.py "$want" 2048 \
    /root/repo/runs/li_excited_full
  echo "=== li continuation done rc=$? $(date) ===" >> "$Q"
  grep "SUMMARY" runs/li_excited_r6.log >> "$Q" || true
  export_commit li_excited_full "Li excited continuation artifacts (r6)"
fi
echo "=== queue_session_r6 finished $(date) ===" >> "$Q"
