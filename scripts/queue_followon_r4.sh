#!/bin/bash
# Round-4 follow-on window: runs after queue_postsession_r4 releases the chip.
#
#   1. Matched multi-tau C-atom DMC study (VERDICT-r3 item 8 / BASELINE
#      tau->0 caveat): the round-1 two-point fit was protocol-confounded
#      (different total imaginary time per tau). This runs tau in
#      {0.08, 0.04, 0.02, 0.01} with IDENTICAL protocol: same trial
#      (runs/c_kfac_fstream t=39207, EMA), same 8 a.u. of imaginary time
#      per block (iterations x nsteps(10) x tau = 8), same 20 blocks, same
#      20% discard in the consumer (dmc_tau_extrapolation) — so equal
#      discard in imaginary time. Cheapest tau first so a truncated window
#      still yields >= 3 matched points.
#   2. Li excited-state continuation t=2324 -> ~6300 (the showcase wedged at
#      t=3493; restore-or-init continues from the committed checkpoint) +
#      the spectroscopy summary.
#   3. tau 0.01 leg (the expensive point) if time allows.
#   4. no-Y ablation legs fill any remainder (flagship recipe probe).
#
# Usage: nohup bash scripts/queue_followon_r4.sh <hard_end_epoch> [wait_pid] &
#   wait_pid: PID of the queue currently holding the chip (passed explicitly
#   — no pattern-matching of process tables).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_followon_r4.log
HARD_END="${1:?hard_end epoch required}"
WAIT_PID="${2:-}"
mkdir -p runs
echo "=== follow-on queue armed $(date) hard_end=$(date -d @$HARD_END) wait_pid=${WAIT_PID:-none} ===" >> "$Q"

# Wait for the post-session queue (which itself waits on the session queue).
while [ -n "$WAIT_PID" ] && kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
echo "=== chip free, follow-on start $(date) ===" >> "$Q"

left() { echo $(( HARD_END - $(date +%s) )); }

dmc_tau() {  # dmc_tau <tau> <iters_per_block> <tag> <timeout_s>
  local tau="$1" iters="$2" tag="$3" tmo="$4"
  [ "$(left)" -lt $(( tmo / 2 )) ] && { echo "=== skip $tag (no time) ===" >> "$Q"; return; }
  [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  echo "=== $tag start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" python -u scripts/run_c_ccecp_dmc_big.py \
    /root/repo/runs/c_kfac_fstream 20 "$iters" "/root/repo/runs/$tag" "$tau" \
    ferminet forward 16 256 > "runs/${tag}.log" 2>&1
  echo "=== $tag done rc=$? $(date) ===" >> "$Q"
  grep "FINAL robust" "runs/${tag}.log" >> "$Q" || true
  bash scripts/export_artifacts.sh "$tag" >> "$Q" 2>&1
  git add "artifacts/$tag" 2>/dev/null && \
    git commit -q -m "Matched-protocol DMC tau=$tau artifacts (tau->0 study)" \
      -- "artifacts/$tag" 2>/dev/null || true
}

# --- stage 1: three cheap matched points (8 a.u. per block each) ---
dmc_tau 0.08 10 c_dmc_tau008 1500
dmc_tau 0.04 20 c_dmc_tau004 2100
dmc_tau 0.02 40 c_dmc_tau002 3000

# --- stage 2: Li continuation + summary ---
if [ "$(left)" -ge 2100 ]; then
  tmo=3000; [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  echo "=== li continuation start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" python -u scripts/run_li_excited_full.py 4000 2048 \
    /root/repo/runs/li_excited_full > runs/li_excited_cont.log 2>&1
  echo "=== li continuation done rc=$? $(date) ===" >> "$Q"
  grep "SUMMARY" runs/li_excited_cont.log >> "$Q" || true
  bash scripts/export_artifacts.sh li_excited_full >> "$Q" 2>&1
  git add artifacts/li_excited_full 2>/dev/null && \
    git commit -q -m "Li excited continuation artifacts" \
      -- artifacts/li_excited_full 2>/dev/null || true
fi

# --- stage 2b: C2 equilibrium-bond AD-SWCT forces (frozen eval, EMA trial) ---
if [ "$(left)" -ge 2000 ]; then
  tmo=2400; [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  echo "=== c2 forces start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" python -u scripts/run_c2_forces.py /root/repo/runs/c2_kfac \
    400 1024 /root/repo/runs/c2_forces 2.348 > runs/c2_forces.log 2>&1
  echo "=== c2 forces done rc=$? $(date) ===" >> "$Q"
  grep "FORCES\|FROZEN" runs/c2_forces.log >> "$Q" || true
fi

# --- stage 3: the expensive tau point, only if the window is generous ---
# (3 matched points already validate the linear model with 1 dof; the
# published-form arm below outranks a 4th point.)
[ "$(left)" -ge 9000 ] && dmc_tau 0.01 80 c_dmc_tau001 4200

# --- stage 4: tau->0 extrapolation over whatever landed ---
python - <<'PYEOF' >> "$Q" 2>&1
from aiqmc_tpu.utils import analysis_tools as at
import os
runs = [(t, f"runs/c_dmc_tau{tag}/DMC_states.csv")
        for t, tag in [(0.08, "008"), (0.04, "004"), (0.02, "002"),
                       (0.01, "001")]]
runs = [r for r in runs if os.path.exists(r[1])]
print("TAU-EXTRAP points:", [r[0] for r in runs])
if len(runs) >= 2:
    print("TAU-EXTRAP", at.dmc_tau_extrapolation(runs))
PYEOF

# --- stage 5: published-form arm legs fill the remainder ---
# h ferminet + y_stream OFF + isotropic exponential envelope = the exact
# published-FermiNet orbital form (BOTH structural deltas to the published
# recipe removed; pp_like's Gaussian tail cannot represent the exponential
# valence decay). Restorable arm: next rounds continue it.
leg=0
while [ "$(left)" -ge 1500 ]; do
  leg=$(( leg + 1 )); tmo=5400; [ "$tmo" -gt "$(left)" ] && tmo=$(left)
  echo "=== pubform leg $leg start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" python -u scripts/run_c_ccecp_kfac_fstream.py 99999 \
    /root/repo/runs/c_pubform forward 16 256 off isotropic \
    > "runs/c_pubform_f${leg}.log" 2>&1
  echo "=== pubform leg $leg ended rc=$? $(date) ===" >> "$Q"
  bash scripts/export_artifacts.sh c_pubform >> "$Q" 2>&1
  git add artifacts/c_pubform 2>/dev/null && \
    git commit -q -m "Checkpoint published-form arm leg (follow-on)" \
      -- artifacts/c_pubform 2>/dev/null || true
done
echo "=== follow-on queue finished $(date) ===" >> "$Q"
