#!/bin/bash
# Round-5 MASTER chip queue — supersedes queue_session_r5.sh (which assumed a
# fresh box; this round inherits a live box where the round-4 post-session
# queue already delivered the full-suite run, the wide-arm frozen eval and an
# in-flight HEG leg). Ordering implements VERDICT round-4 "Next round":
#
#   A. targeted CPU test batch (the two round-4 failures' files + the files
#      touched by the round-5 fixes) while the chip is idle;
#   B. FLAGSHIP: published-form arm legs (h ferminet + y_stream off +
#      isotropic envelope = the exact published-FermiNet orbital form;
#      VERDICT item 1) with a real decision gate (ADVICE r4): after each leg,
#      compare pubform to the f-stream arm's committed trace at matched t;
#      if pubform trails by > GATE_MHA at t >= GATE_T, switch the remaining
#      flagship window to the c_noy attribution arm;
#   C. matched-protocol DMC tau->0 study, tau in {0.08, 0.04, 0.02}, 8 a.u.
#      of imaginary time per block, same f-stream EMA trial (VERDICT item 4)
#      + extrapolation printout;
#   D. FULL CPU pytest suite (VERDICT item 2) — started when the chip budget
#      ends; DURING the suite the chip runs only expendable bonus legs
#      (C2 forces, then Li continuation). This is a calculated, documented
#      gamble: both recorded futex wedges hit the CHIP process while CPU jax
#      ran concurrently, never the CPU job, and the wedge watchdog below
#      bounds the loss to STALL_S — if the bonus leg survives we get the
#      forces number "for free", if it wedges we lose only time we could not
#      have used for chip work anyway (the suite must run chip-exclusive
#      otherwise).
#
# WEDGE WATCHDOG (VERDICT item 9): every chip leg runs under watched(),
# which monitors the newest mtime across the leg's run dir + log; a leg
# whose outputs freeze for STALL_S seconds (the recorded wedge signature:
# main thread in futex_do_wait, CSV mtime frozen, tunnel healthy) is killed
# by explicit PID (timeout forwards TERM; surviving children are killed via
# ps --ppid — never by name pattern). STALL_S default 1500 s clears the
# multi-minute first-compile window of fresh programs.
#
# Usage: nohup bash scripts/queue_master_r5.sh <hard_end_epoch> [wait_pid] &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_master_r5.log
HARD_END="${1:?hard_end epoch required}"
WAIT_PID="${2:-}"
STALL_S="${STALL_S:-1500}"
GATE_MHA="${GATE_MHA:-20}"   # pubform-vs-fstream gate margin, mHa
GATE_T="${GATE_T:-4000}"     # gate only judges at t >= this
mkdir -p runs
echo "=== master r5 queue armed $(date) hard_end=$(date -d @$HARD_END) wait_pid=${WAIT_PID:-none} stall=${STALL_S}s ===" >> "$Q"

left() { echo $(( HARD_END - $(date +%s) )); }

# watched() — wedge watchdog, shared with scripts/watchdog_selftest.sh.
. scripts/watchdog_lib.sh

export_commit() {  # export_commit <run_name> <msg>
  bash scripts/export_artifacts.sh "$1" >> "$Q" 2>&1
  git add "artifacts/$1" 2>/dev/null && \
    git commit -q -m "$2" -- "artifacts/$1" 2>/dev/null || true
}

# --- stage 0: wait for the inherited HEG leg, then bank it ---
while [ -n "$WAIT_PID" ] && kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
if [ -n "$WAIT_PID" ]; then
  echo "=== inherited HEG leg exited $(date) ===" >> "$Q"
  grep -E "HF anchor|FINAL|SUMMARY" runs/heg_rs1.log >> "$Q" 2>/dev/null || true
  export_commit heg_rs1 "HEG rs=1 showcase artifacts (r5)"
fi

# --- stage A: targeted CPU test batch (chip idle) ---
echo "=== targeted tests start $(date) ===" >> "$Q"
timeout 2400 python -m pytest tests/test_forces.py tests/test_configs.py \
  tests/test_pbc_gvector.py tests/test_observables.py -q \
  > runs/pytest_targeted_r5.log 2>&1
tail -2 runs/pytest_targeted_r5.log >> "$Q"
# bench.py gained an overrides hook for the flagship MFU profile; smoke the
# default AND overrides paths on CPU before the driver's end-of-round bench
# depends on the file (tiny shapes; ~2 min).
timeout 900 env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python -c "
import bench
r, _ = bench.measure(64, 1, 1, laplacian='default')
print('bench default-path smoke ok', r)
pb = bench.build_step(64, laplacian='default', overrides={
    'network.hidden_dims': ((16, 8), (16, 8)),
    'network.determinants': 2,
    'network.h_stream': 'ferminet',
    'optim.optimizer': 'kfac'})
r2, _ = bench.measure(64, 1, 1, prebuilt=pb)
print('bench overrides-path smoke ok', r2)
" > runs/bench_smoke_r5.log 2>&1
tail -2 runs/bench_smoke_r5.log >> "$Q"

# --- stage A2: MFU at the flagship production shape (VERDICT item 8) ---
# Runs BEFORE the flagship legs: it is ~20 min against a 4-round-old open
# item, and stage-C caps would otherwise squeeze it out of the chip budget.
echo "=== flagship MFU profile start $(date) ===" >> "$Q"
watched 1300 runs/profile_mfu_flagship.log /tmp/jaxcache \
  python -u scripts/profile_mfu.py --flagship --batch=2048
echo "=== flagship MFU profile rc=$? ===" >> "$Q"
grep -E "MFU|step time|throughput|FLOPs" runs/profile_mfu_flagship.log >> "$Q" || true

# --- stage B: published-form flagship legs with the decision gate ---
# Chip budget ends early enough to fit the full suite (5700 s + slack);
# the tau->0 study (~6900 s with margins) comes out of the budget first.
CHIP_END=$(( HARD_END - 6200 ))
PUB_END=$(( CHIP_END - 7000 ))
ARM=c_pubform
ARM_ARGS="off isotropic"
leg=0
while true; do
  now=$(date +%s); remaining=$(( PUB_END - now ))
  [ "$remaining" -lt 1200 ] && break
  leg=$(( leg + 1 )); tmo=5400; [ "$tmo" -gt "$remaining" ] && tmo=$remaining
  echo "=== $ARM leg $leg start tmo=${tmo}s $(date) ===" >> "$Q"
  # shellcheck disable=SC2086
  watched "$tmo" "runs/${ARM}_r5_leg${leg}.log" "runs/$ARM" \
    python -u scripts/run_c_ccecp_kfac_fstream.py 99999 \
    "/root/repo/runs/$ARM" forward 16 256 $ARM_ARGS
  rc=$?
  echo "=== $ARM leg $leg ended rc=$rc $(date) ===" >> "$Q"
  export_commit "$ARM" "Checkpoint $ARM arm leg $leg (r5)"
  # Decision gate (ADVICE r4): judge pubform against the f-stream trace at
  # matched t; on a measured refutation switch to the no-Y attribution arm.
  if [ "$ARM" = "c_pubform" ]; then
    gate=$(python scripts/gate_pubform.py "$GATE_MHA" "$GATE_T" 2>> "$Q")
    echo "=== gate: $gate ===" >> "$Q"
    if [ "$gate" = "SWITCH" ]; then
      ARM=c_noy; ARM_ARGS="off"; leg=0
      echo "=== decision gate fired: flagship window -> c_noy $(date) ===" >> "$Q"
    fi
  fi
done

# --- stage C: matched-protocol tau->0 study ---
dmc_tau() {  # dmc_tau <tau> <iters_per_block> <tag> <timeout_s>
  local tau="$1" iters="$2" tag="$3" tmo="$4"
  [ "$(( CHIP_END - $(date +%s) ))" -lt $(( tmo * 2 / 3 )) ] && {
    echo "=== skip $tag (no chip budget) ===" >> "$Q"; return; }
  echo "=== $tag start tmo=${tmo}s $(date) ===" >> "$Q"
  watched "$tmo" "runs/${tag}.log" "runs/$tag" \
    python -u scripts/run_c_ccecp_dmc_big.py \
    /root/repo/runs/c_kfac_fstream 20 "$iters" "/root/repo/runs/$tag" "$tau" \
    ferminet forward 16 256
  echo "=== $tag done rc=$? $(date) ===" >> "$Q"
  grep "FINAL robust" "runs/${tag}.log" >> "$Q" || true
  export_commit "$tag" "Matched-protocol DMC tau=$tau artifacts (tau->0 study, r5)"
}
# Restore the f-stream trial from artifacts if runs/ lost it.
if ! ls runs/c_kfac_fstream/qmcjax_ckpt_*.npz >/dev/null 2>&1; then
  mkdir -p runs/c_kfac_fstream
  lastck=$(ls artifacts/c_kfac_fstream/qmcjax_ckpt_*.npz 2>/dev/null | sort -V | tail -1)
  [ -n "$lastck" ] && cp "$lastck" runs/c_kfac_fstream/ && \
    echo "=== restored c_kfac_fstream trial from $(basename "$lastck") ===" >> "$Q"
fi
dmc_tau 0.08 10 c_dmc_tau008 1500
dmc_tau 0.04 20 c_dmc_tau004 2100
dmc_tau 0.02 40 c_dmc_tau002 3200

# tau->0 extrapolation over whatever landed (chip idle at this point).
python - <<'PYEOF' >> "$Q" 2>&1
from aiqmc_tpu.utils import analysis_tools as at
import os
runs = [(t, f"runs/c_dmc_tau{tag}/DMC_states.csv")
        for t, tag in [(0.08, "008"), (0.04, "004"), (0.02, "002")]]
runs = [r for r in runs if os.path.exists(r[1])]
print("TAU-EXTRAP points:", [r[0] for r in runs])
if len(runs) >= 2:
    print("TAU-EXTRAP", at.dmc_tau_extrapolation(runs))
PYEOF

# Flagship-arm reporting at the chip-idle boundary: matched-t gate
# diagnostics + power-law trajectory fit of whatever pubform accumulated.
echo "=== pubform trajectory report $(date) ===" >> "$Q"
python scripts/gate_pubform.py 20 0 > /dev/null 2>> "$Q" || true
timeout 600 python scripts/analyze_flagship_trajectory.py c_pubform 500 200 \
  >> "$Q" 2>&1 || true

# --- stage D: full suite (CPU) + expendable bonus chip legs ---
echo "=== full suite start $(date) ===" >> "$Q"
timeout 7000 python -m pytest tests/ -q > runs/pytest_full_r5.log 2>&1 &
PYTEST_PID=$!

if [ "$(left)" -ge 2600 ]; then
  echo "=== bonus: c2 forces start (concurrent with suite — documented gamble) $(date) ===" >> "$Q"
  watched 2400 runs/c2_forces.log runs/c2_forces \
    python -u scripts/run_c2_forces.py /root/repo/runs/c2_kfac \
    400 1024 /root/repo/runs/c2_forces 2.348
  echo "=== c2 forces done rc=$? $(date) ===" >> "$Q"
  grep -E "FORCES|FROZEN" runs/c2_forces.log >> "$Q" || true
fi
li_t=$(ls runs/li_excited_full/qmcjax_ckpt_*.npz 2>/dev/null | sort -V \
       | sed 's/.*_0*\([0-9][0-9]*\)\.npz/\1/' | tail -1)
if [ "${li_t:-0}" -lt 5500 ] && [ "$(left)" -ge 1900 ]; then
  want=$(( 6000 - ${li_t:-0} )); tmo=$(( $(left) - 600 ))
  [ "$tmo" -gt 3000 ] && tmo=3000
  echo "=== bonus: li continuation (+$want iters) tmo=${tmo}s $(date) ===" >> "$Q"
  watched "$tmo" runs/li_excited_r5.log runs/li_excited_full \
    python -u scripts/run_li_excited_full.py "$want" 2048 \
    /root/repo/runs/li_excited_full
  echo "=== li continuation done rc=$? $(date) ===" >> "$Q"
  grep "SUMMARY" runs/li_excited_r5.log >> "$Q" || true
  export_commit li_excited_full "Li excited continuation artifacts (r5)"
fi

wait "$PYTEST_PID" 2>/dev/null
tail -3 runs/pytest_full_r5.log >> "$Q"
cp runs/pytest_full_r5.log artifacts/pytest_full_r5.log
git add artifacts/pytest_full_r5.log 2>/dev/null && \
  git commit -q -m "Round-5 full-suite run log" \
    -- artifacts/pytest_full_r5.log 2>/dev/null || true
echo "=== master r5 queue finished $(date) ===" >> "$Q"
