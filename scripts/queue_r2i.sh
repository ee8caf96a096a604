#!/bin/bash
# Chip queue, part 8: tunnel-outage-aware replacement for r2g/r2h.
# The axon tunnel died ~19:47 (twist_b froze mid-run; Si got UNAVAILABLE at
# backend init; a fresh jax.devices() hangs). Each stage now waits for a
# health probe to pass before launching, so a down tunnel costs polling time,
# not stage timeouts.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue8.log
HARD_END="${1:?hard_end epoch}"
echo "=== queue_r2i start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

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

run_stage c_spring_probe2 1800 python -u scripts/run_c_spring_big.py 700 \
  /root/repo/runs/c_spring_probe2 /root/repo/runs/c_kfac_big 0.1 0.01 0.99

run_stage diamond_twist_b2 2700 python -u scripts/run_diamond_ccecp.py 2400 \
  /root/repo/runs/diamond_twist_b 0.25 -0.25 0.25

run_stage c_kfac_lrboost 20000 python -u scripts/run_c_ccecp_kfac_big.py \
  20000 /root/repo/runs/c_kfac_lrboost 0.05 10000 /root/repo/runs/c_kfac_big

echo "=== queue_r2i finished $(date) ===" >> "$Q"
