#!/bin/bash
# Round-5 post-session window: runs once queue_master_r5 exits (chip free
# after the driver's end-of-round bench — a 900 s grace sleep covers it).
# The round-4 post-session window is how HEG finally ran; same idea:
#
#   1. published-form flagship legs continue (restore-or-init is additive;
#      the next round inherits the arm via committed artifacts);
#   2. C2 VMC trial extension t=8.6k -> 20k+ (VERDICT item 5 — dropped from
#      the in-session window for the tau->0 study);
#   3. a fresh C2 DMC from the extended trial if the window is generous
#      (NEW save dir: new nodes).
#
# All chip legs run under the wedge watchdog (scripts/watchdog_lib.sh).
# Usage: nohup bash scripts/queue_postsession_r5.sh <hard_end_epoch> [wait_pid] &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_post_r5.log
HARD_END="${1:?hard_end epoch required}"
WAIT_PID="${2:-}"
STALL_S="${STALL_S:-1500}"
mkdir -p runs
. scripts/watchdog_lib.sh
echo "=== post-session r5 queue armed $(date) hard_end=$(date -d @$HARD_END) wait_pid=${WAIT_PID:-none} ===" >> "$Q"

while [ -n "$WAIT_PID" ] && kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
sleep 900   # grace: let the driver's end-of-round bench.py have the chip
echo "=== chip free, post-session start $(date) ===" >> "$Q"

left() { echo $(( HARD_END - $(date +%s) )); }

export_commit() {
  bash scripts/export_artifacts.sh "$1" >> "$Q" 2>&1
  git add "artifacts/$1" 2>/dev/null && \
    git commit -q -m "$2" -- "artifacts/$1" 2>/dev/null || true
}

# --- stage 0b: HEG continuation if the in-session leg fell short ---
# (restore is additive: pass the REMAINING iterations; target t=6000 total.)
heg_t=$(ls runs/heg_rs1/qmcjax_ckpt_*.npz 2>/dev/null | sort -V \
        | sed 's/.*_0*\([0-9][0-9]*\)\.npz/\1/' | tail -1)
if [ "${heg_t:-0}" -lt 5500 ] && [ "$(left)" -ge 5500 ]; then
  want=$(( 6000 - ${heg_t:-0} ))
  echo "=== post heg continuation (+$want iters) start $(date) ===" >> "$Q"
  watched 5000 runs/heg_rs1_post.log runs/heg_rs1 \
    python -u scripts/run_heg.py "$want" /root/repo/runs/heg_rs1 1.0 forward 2048
  echo "=== post heg continuation done rc=$? $(date) ===" >> "$Q"
  grep -E "FINAL|correlation" runs/heg_rs1_post.log >> "$Q" || true
  export_commit heg_rs1 "HEG rs=1 continuation artifacts (r5 post-session)"
fi

# --- stage 1: two more flagship legs (gate-aware) ---
ARM=c_pubform; ARM_ARGS="off isotropic"
for leg in 1 2; do
  [ "$(left)" -lt 4000 ] && break
  tmo=5400; [ "$tmo" -gt "$(( $(left) - 1200 ))" ] && tmo=$(( $(left) - 1200 ))
  echo "=== post $ARM leg $leg start tmo=${tmo}s $(date) ===" >> "$Q"
  # shellcheck disable=SC2086
  watched "$tmo" "runs/${ARM}_post_leg${leg}.log" "runs/$ARM" \
    python -u scripts/run_c_ccecp_kfac_fstream.py 99999 \
    "/root/repo/runs/$ARM" forward 16 256 $ARM_ARGS
  echo "=== post $ARM leg $leg ended rc=$? $(date) ===" >> "$Q"
  export_commit "$ARM" "Checkpoint $ARM arm post-session leg $leg (r5)"
  gate=$(python scripts/gate_pubform.py 20 4000 2>> "$Q")
  echo "=== gate: $gate ===" >> "$Q"
  [ "$gate" = "SWITCH" ] && { ARM=c_noy; ARM_ARGS="off"; }
done

# --- stage 2: C2 VMC trial extension legs ---
# Restore the C2 trial from artifacts if runs/ lost it (box swap).
if ! ls runs/c2_kfac/qmcjax_ckpt_*.npz >/dev/null 2>&1; then
  mkdir -p runs/c2_kfac
  lastck=$(ls artifacts/c2_kfac/qmcjax_ckpt_*.npz 2>/dev/null | sort -V | tail -1)
  [ -n "$lastck" ] && cp "$lastck" runs/c2_kfac/ && \
    echo "=== restored c2_kfac trial from $(basename "$lastck") ===" >> "$Q"
fi
leg=0
while [ "$(left)" -ge 6500 ]; do
  leg=$(( leg + 1 )); tmo=5400
  echo "=== post c2 vmc leg $leg start tmo=${tmo}s $(date) ===" >> "$Q"
  watched "$tmo" "runs/c2_kfac_post_leg${leg}.log" runs/c2_kfac \
    python -u scripts/run_c2_ccecp_kfac.py 99999 /root/repo/runs/c2_kfac
  echo "=== post c2 vmc leg $leg ended rc=$? $(date) ===" >> "$Q"
  export_commit c2_kfac "Checkpoint C2 VMC extension post-session leg $leg (r5)"
done

# --- stage 3: fresh C2 DMC from the extended trial (NEW save dir) ---
if [ "$(left)" -ge 4500 ]; then
  tmo=$(( $(left) - 600 )); [ "$tmo" -gt 9000 ] && tmo=9000
  echo "=== post c2 dmc start tmo=${tmo}s $(date) ===" >> "$Q"
  watched "$tmo" runs/c2_dmc_r5.log runs/c2_dmc_r5 \
    python -u scripts/run_c2_ccecp_dmc.py /root/repo/runs/c2_kfac \
    60 40 /root/repo/runs/c2_dmc_r5 0.02 forward 2.348 1024
  echo "=== post c2 dmc done rc=$? $(date) ===" >> "$Q"
  export_commit c2_dmc_r5 "C2 DMC from extended trial (r5 post-session)"
fi
echo "=== post-session r5 queue finished $(date) ===" >> "$Q"
