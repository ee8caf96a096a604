#!/bin/bash
# Chip queue, part 4 (replaces queue_r2d.sh after the SPRING continuation
# diverged on-chip — see runs/c_spring_big; non-variational, variance 5-20 Ha²).
#   1. KFAC continuation of the flagship C trial (runs/c_kfac_big, t=36410 ->
#      more iterations; train.py auto-resumes from save_path) — iteration
#      count is the measured lever on the fixed node (ROADMAP).
#   2. DMC from the continued KFAC checkpoint.
#   3. the two inequivalent 2x2x2 MP twists of the diamond ccECP cell ->
#      physically meaningful TABC average.
#   4. Si all-electron retry with the step-rejection guard + halved LR.
# Each stage's timeout is clamped so NOTHING runs past HARD_END: the chip is
# free before round-end bench.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue8.log
HARD_END="${1:-1787010000}"   # epoch seconds: no stage may run past this
echo "=== queue_r2e start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

run_stage () {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  local now remaining
  now=$(date +%s)
  remaining=$(( HARD_END - now ))
  if [ "$remaining" -lt 900 ]; then
    echo "=== $name SKIPPED (only ${remaining}s left) $(date) ===" >> "$Q"
    return
  fi
  if [ "$tmo" -gt "$remaining" ]; then tmo=$remaining; fi
  echo "=== $name start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name done rc=$? $(date) ===" >> "$Q"
}

# Stage 1: ~2.6h more KFAC on the flagship trial (auto-resumes at t=36411;
# target far above what fits -> runs to timeout, checkpoints every 10 min).
run_stage c_kfac_big3 9400 python -u scripts/run_c_ccecp_kfac_big.py 60000 \
  /root/repo/runs/c_kfac_big

# Stage 2: DMC on the continued trial's nodes.
run_stage c_dmc_big2 4500 python -u scripts/run_c_ccecp_dmc_big.py \
  /root/repo/runs/c_kfac_big 60 40 /root/repo/runs/c_dmc_big2 0.02

# Stage 3: twist-trained complex-pairs diamond at the two inequivalent
# 2x2x2 MP twists (weights 2:6 -> TABC average).
run_stage diamond_twist_a 4200 python -u scripts/run_diamond_ccecp.py 3500 \
  /root/repo/runs/diamond_twist_a 0.25 0.25 0.25

run_stage diamond_twist_b 4200 python -u scripts/run_diamond_ccecp.py 3500 \
  /root/repo/runs/diamond_twist_b 0.25 -0.25 0.25

# Stage 4: Si all-electron with the statistical step-rejection guard.
run_stage si_vmc2 3600 python -u scripts/run_si_vmc.py 2500 \
  /root/repo/runs/si_vmc2

echo "=== queue_r2e finished $(date) ===" >> "$Q"
