#!/bin/bash
# Second amendment (see queue_r2m2.sh): the rebuilt diamond twist_a plateaued
# 0.37 Ha ABOVE its round-2 twin (same script/seed/laplacian), so one of the
# two boxes computes corrupted pair local energies. Before spending the rest
# of the chip day, run the decisive CROSS-DEVICE oracle (chip vs pinned-CPU
# subprocess on identical inputs, scripts/probe_el_cross_device.py) plus the
# forward-miscompile bisect ladder; the remaining physics stages only run if
# the cross-device probe PASSes (otherwise every number they'd produce is
# untrustworthy and the chip time is better spent bisecting by hand).
#
# Usage: nohup bash scripts/queue_r2m3.sh <hard_end_epoch> [wait_pid] &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p runs
Q=/root/repo/runs/chip_queue_r2m.log
HARD_END="${1:?hard_end epoch required}"
WAIT_PID="${2:-}"
echo "=== queue_r2m3 start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  echo "=== prior chip job $WAIT_PID exited $(date) ===" >> "$Q"
fi

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

run_stage probe_el_cross_device 3600 python -u \
  scripts/probe_el_cross_device.py both
run_stage probe_forward_ladder 2400 python -u scripts/probe_forward_ladder.py

if ! grep -q "CROSS-DEVICE PASS" runs/probe_el_cross_device.log 2>/dev/null; then
  echo "=== CROSS-DEVICE FAIL: physics stages SKIPPED (see $(date)) ===" >> "$Q"
  echo "=== queue_r2m3 finished (untrusted backend) $(date) ===" >> "$Q"
  exit 0
fi

run_stage diamond_dmc 7200 python -u scripts/run_diamond_dmc.py \
  /root/repo/runs/diamond_twist_a 0.25 0.25 0.25 40 40 \
  /root/repo/runs/diamond_dmc 0.01

run_stage si_vmc3 9000 python -u scripts/run_si_vmc.py 3000 \
  /root/repo/runs/si_vmc3 default

now=$(date +%s)
rem=$(( HARD_END - now - 600 ))
if [ "$rem" -gt 3600 ]; then
  # ~0.3 it/s at batch 4096 on the old box; this box trains the diamond cell
  # ~2.3x faster, so size by rate 0.5 it/s and let the timeout clamp.
  iters=$(( rem / 2 ))
  run_stage c_fstream "$rem" python -u scripts/run_c_ccecp_kfac_fstream.py \
    "$iters" /root/repo/runs/c_kfac_fstream default
else
  echo "=== c_fstream SKIPPED (rem=${rem}s) $(date) ===" >> "$Q"
fi

echo "=== queue_r2m3 finished $(date) ===" >> "$Q"
