#!/bin/bash
# Chip queue, part 5 (replaces queue_r2e.sh). Waits for the already-running
# KFAC continuation (started by r2e, now orphaned), then:
#   1. short on-chip SPRING probe — validates the HIGHEST-precision fix for
#      the O-matmuls (the 2026-08-17 divergence root cause) on real hardware
#   2. DMC from the continued KFAC checkpoint
#   3. the two inequivalent 2x2x2 MP twists of the diamond ccECP cell
#   4. Si all-electron retry with the step-rejection guard
# Stage timeouts are clamped to HARD_END so the chip is free for round-end
# bench.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue8.log
HARD_END="${1:-1787010000}"
WAIT_PID="${2:-}"
echo "=== queue_r2f start $(date) hard_end=$(date -d @$HARD_END) wait=$WAIT_PID ===" >> "$Q"

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "=== prior chip job $WAIT_PID exited $(date) ===" >> "$Q"
fi

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

# Stage 1: SPRING probe, ~20 min budget. Continues runs/c_kfac_big into a
# fresh dir; success = finite, variational energies with sane variance.
run_stage c_spring_probe 1500 python -u scripts/run_c_spring_big.py 700 \
  /root/repo/runs/c_spring_probe /root/repo/runs/c_kfac_big

# Stage 2: DMC on the continued KFAC trial's nodes.
run_stage c_dmc_big2 4500 python -u scripts/run_c_ccecp_dmc_big.py \
  /root/repo/runs/c_kfac_big 60 40 /root/repo/runs/c_dmc_big2 0.02

# Stage 3: twist-trained complex-pairs diamond at the two inequivalent
# 2x2x2 MP twists (weights 2:6 -> TABC average).
run_stage diamond_twist_a 4200 python -u scripts/run_diamond_ccecp.py 3500 \
  /root/repo/runs/diamond_twist_a 0.25 0.25 0.25

run_stage diamond_twist_b 4200 python -u scripts/run_diamond_ccecp.py 3500 \
  /root/repo/runs/diamond_twist_b 0.25 -0.25 0.25

# Stage 4: Si all-electron with the statistical step-rejection guard.
run_stage si_vmc2 3300 python -u scripts/run_si_vmc.py 2300 \
  /root/repo/runs/si_vmc2

echo "=== queue_r2f finished $(date) ===" >> "$Q"
