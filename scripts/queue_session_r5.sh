#!/bin/bash
# SUPERSEDED in-round by scripts/queue_master_r5.sh, which adds the wedge
# watchdog and actually IMPLEMENTS the stage-3 decision gate this header
# describes (via scripts/gate_pubform.py; ADVICE r4 flagged the gap — the
# stage-3 loop below runs pubform unconditionally). Keep this script only as
# the fresh-box bootstrap (trust gate + artifact restore); prefer the master
# queue whenever the box already passed the trust gate.
#
# Round-5 session bootstrap: chains the chip campaign with wedge-tolerance
# and per-stage artifact commits. Mirrors queue_session_r4.sh with the
# round-4 results folded in:
#
#   1. backend trust gate (retried; aborts physics on 3 failures);
#   2. restore runs/ from committed artifacts (box swaps wipe runs/);
#   3. FLAGSHIP ARM by decision gate: if the published-form arm
#      (runs/c_pubform, h ferminet + y_stream off + isotropic envelope —
#      round-4 trajectory fits put BOTH pp_like arms' asymptotes >= 6.8 mHa
#      above the published -5.4254 at ANY budget) is at or below the
#      f-stream trajectory at matched t, continue it legged; else continue
#      the no-Y attribution arm or fall back to SPRING continuation of the
#      best trial. A fresh pubform arm start (if round 4 never seeded it)
#      is also handled: the script restore-or-inits.
#   4. C2 VMC extension (THE remaining C2 item: trial fixed node costs
#      ~22 mHa vs literature; extend runs/c2_kfac t=8.6k -> 20k+), then
#   5. C2 DMC from the extended trial (fresh save dir — new nodes!);
#   6. HEG showcase if round 4's post-session window never ran it;
#   7. Li excited continuation if < 6000 iterations accumulated.
#
# Usage: nohup bash scripts/queue_session_r5.sh <hard_end_epoch> &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_session_r5.log
HARD_END="${1:?hard_end epoch required}"
mkdir -p runs
echo "=== queue_session_r5 start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

left() { echo $(( HARD_END - $(date +%s) )); }

GATE_OK=0
for attempt in 1 2 3; do
  timeout 2400 python -u scripts/probe_el_cross_device.py \
    > "runs/probe_trust_r5_a${attempt}.log" 2>&1
  grep -q "CROSS-DEVICE PASS" "runs/probe_trust_r5_a${attempt}.log" && { GATE_OK=1; break; }
  echo "=== trust gate attempt $attempt failed/wedged $(date) ===" >> "$Q"
done
[ "$GATE_OK" -ne 1 ] && { echo "=== TRUST GATE FAILED — no physics ===" >> "$Q"; exit 1; }
echo "=== trust gate PASS ===" >> "$Q"

for run in c_pubform c_noy c_kfac_fstream c_kfac_wide c2_kfac c2_dmc \
           li_excited_full heg_rs1; do
  [ -d "artifacts/$run" ] || continue
  have=$(ls "runs/$run"/qmcjax_ckpt_*.npz 2>/dev/null | sort -V | tail -1)
  last=$(ls "artifacts/$run"/qmcjax_ckpt_*.npz 2>/dev/null | sort -V | tail -1)
  [ -n "$last" ] || continue
  if [ -z "$have" ] || [ "$(basename "$last")" \> "$(basename "$have")" ]; then
    mkdir -p "runs/$run" && cp "$last" "runs/$run/" && \
      echo "=== restored $run from $(basename "$last") ===" >> "$Q"
  fi
done

# --- stage 3: flagship arm (published-form continuation) ---
now=$(date +%s); total=$(( HARD_END - now ))
FLAG_END=$(( now + total * 5 / 10 ))
leg=0
while true; do
  now=$(date +%s); remaining=$(( FLAG_END - now ))
  [ "$remaining" -lt 1500 ] && break
  leg=$(( leg + 1 )); tmo=5400; [ "$tmo" -gt "$remaining" ] && tmo=$remaining
  echo "=== pubform leg $leg start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" python -u scripts/run_c_ccecp_kfac_fstream.py 99999 \
    /root/repo/runs/c_pubform forward 16 256 off isotropic \
    > "runs/c_pubform_r5_leg${leg}.log" 2>&1
  echo "=== pubform leg $leg ended rc=$? $(date) ===" >> "$Q"
  bash scripts/export_artifacts.sh c_pubform >> "$Q" 2>&1
  git add artifacts/c_pubform 2>/dev/null && \
    git commit -q -m "Checkpoint published-form arm leg $leg (r5)" \
      -- artifacts/c_pubform 2>/dev/null || true
done

# --- stage 4: C2 VMC extension ---
C2_END=$(( $(date +%s) + $(left) * 6 / 10 ))
leg=0
while true; do
  now=$(date +%s); remaining=$(( C2_END - now ))
  [ "$remaining" -lt 1500 ] && break
  leg=$(( leg + 1 )); tmo=5400; [ "$tmo" -gt "$remaining" ] && tmo=$remaining
  echo "=== c2 vmc leg $leg start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" python -u scripts/run_c2_ccecp_kfac.py 99999 \
    /root/repo/runs/c2_kfac > "runs/c2_kfac_r5_leg${leg}.log" 2>&1
  echo "=== c2 vmc leg $leg ended rc=$? $(date) ===" >> "$Q"
  bash scripts/export_artifacts.sh c2_kfac >> "$Q" 2>&1
  git add artifacts/c2_kfac 2>/dev/null && \
    git commit -q -m "Checkpoint C2 VMC extension leg $leg (r5)" \
      -- artifacts/c2_kfac 2>/dev/null || true
done

# --- stage 5: C2 DMC from the extended trial (NEW save dir: new nodes) ---
if [ "$(left)" -ge 4000 ]; then
  tmo=4500; [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  echo "=== c2 dmc (extended trial) start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" python -u scripts/run_c2_ccecp_dmc.py /root/repo/runs/c2_kfac \
    60 40 /root/repo/runs/c2_dmc_r5 0.02 forward 2.348 1024 \
    > runs/c2_dmc_r5.log 2>&1
  echo "=== c2 dmc done rc=$? $(date) ===" >> "$Q"
  bash scripts/export_artifacts.sh c2_dmc_r5 >> "$Q" 2>&1
  git add artifacts/c2_dmc_r5 2>/dev/null && \
    git commit -q -m "C2 DMC from extended trial (r5)" \
      -- artifacts/c2_dmc_r5 2>/dev/null || true
fi

# --- stage 6: HEG showcase if round 4 never ran it ---
if [ ! -f runs/heg_rs1/train_states.csv ] && [ "$(left)" -ge 4000 ]; then
  tmo=4500; [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  echo "=== heg start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" python -u scripts/run_heg.py 6000 /root/repo/runs/heg_rs1 \
    1.0 forward 2048 > runs/heg_rs1.log 2>&1
  echo "=== heg done rc=$? $(date) ===" >> "$Q"
  bash scripts/export_artifacts.sh heg_rs1 >> "$Q" 2>&1
  git add artifacts/heg_rs1 2>/dev/null && \
    git commit -q -m "HEG rs=1 showcase artifacts (r5)" \
      -- artifacts/heg_rs1 2>/dev/null || true
fi

# --- stage 7: Li continuation if short of 6000 iters ---
li_t=$(ls runs/li_excited_full/qmcjax_ckpt_*.npz 2>/dev/null \
       | sed 's/.*_0*\([0-9][0-9]*\)\.npz/\1/' | sort -n | tail -1)
if [ "${li_t:-0}" -lt 5500 ] && [ "$(left)" -ge 2400 ]; then
  tmo=3000; [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  want=$(( 6000 - ${li_t:-0} ))
  echo "=== li continuation (+$want iters) start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" python -u scripts/run_li_excited_full.py "$want" 2048 \
    /root/repo/runs/li_excited_full > runs/li_excited_r5.log 2>&1
  echo "=== li continuation done rc=$? $(date) ===" >> "$Q"
  grep "SUMMARY" runs/li_excited_r5.log >> "$Q" || true
  bash scripts/export_artifacts.sh li_excited_full >> "$Q" 2>&1
  git add artifacts/li_excited_full 2>/dev/null && \
    git commit -q -m "Li excited continuation artifacts (r5)" \
      -- artifacts/li_excited_full 2>/dev/null || true
fi
echo "=== queue_session_r5 finished $(date) ===" >> "$Q"
