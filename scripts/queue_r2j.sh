#!/bin/bash
# Chip queue, part 9: extended-horizon replacement for r2i (the session got
# ~12 more hours, so the 23:30 hard end was needlessly conservative).
# Runs the ROADMAP decision-tree inputs in priority order:
#   1. c_spring_probe2  — arm-B gate (SPRING damping 0.1 holds the plateau?)
#   2. c_kfac_lrboost   — arm-A gate (4k-iter lr-boost probe; breaks below
#                         -5.417 => schedule-level gap, continue all session)
#   3. diamond_twist_b2 — finish the TABC pair lost to the tunnel outage
#   4. si_vmc3          — Si retry (round-2 attempt lost to the outage)
# The controller (interactive session) reads the probe results and queues the
# winning continuation separately. Every stage is TPU-health-gated.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue9.log
HARD_END="${1:?hard_end epoch}"
echo "=== queue_r2j start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

wait_for_tpu () {
  while true; do
    local now remaining
    now=$(date +%s); remaining=$(( HARD_END - now ))
    if [ "$remaining" -lt 900 ]; then return 1; fi
    if timeout 180 python -c "import jax; jax.devices(); import jax.numpy as jnp; jnp.ones(4).sum().block_until_ready()" > /dev/null 2>&1; then
      echo "=== tpu healthy $(date) ===" >> "$Q"
      return 0
    fi
    echo "=== tpu still down $(date) ===" >> "$Q"
    sleep 120
  done
}

run_stage () {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if ! wait_for_tpu; then
    echo "=== $name SKIPPED (no tpu / no time) $(date) ===" >> "$Q"
    return
  fi
  local now remaining
  now=$(date +%s); remaining=$(( HARD_END - now ))
  if [ "$remaining" -lt 900 ]; then
    echo "=== $name SKIPPED (only ${remaining}s left) $(date) ===" >> "$Q"
    return
  fi
  if [ "$tmo" -gt "$remaining" ]; then tmo=$remaining; fi
  echo "=== $name start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name done rc=$? $(date) ===" >> "$Q"
}

run_stage c_spring_probe2 2400 python -u scripts/run_c_spring_big.py 700 \
  /root/repo/runs/c_spring_probe2 /root/repo/runs/c_kfac_big 0.1 0.01 0.99

run_stage c_kfac_lrboost 10000 python -u scripts/run_c_ccecp_kfac_big.py \
  4000 /root/repo/runs/c_kfac_lrboost 0.05 10000 /root/repo/runs/c_kfac_big

run_stage diamond_twist_b2 3000 python -u scripts/run_diamond_ccecp.py 2400 \
  /root/repo/runs/diamond_twist_b 0.25 -0.25 0.25

run_stage si_vmc3 3600 python -u scripts/run_si_vmc.py 3000 \
  /root/repo/runs/si_vmc3

echo "=== queue_r2j finished $(date) ===" >> "$Q"
