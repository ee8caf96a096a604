#!/bin/bash
# Post-precision-pin physics queue (2026-08-18). The cross-device oracle
# (runs/probe_el_cross4.log) passed with jax_default_matmul_precision=highest
# pinned at package import, proving this box's chip reproduces CPU local
# energies on identical inputs — the earlier "miscompiles" were bf16-truncated
# default matmuls. This queue (a) re-gates the forward-Laplacian / fused-DMC
# fast paths under the pin, (b) RETRAINS the diamond twists (the existing
# runs/diamond_twist_* were trained on the unpinned, corrupted backend),
# (c) runs fixed-phase diamond DMC + Si VMC, (d) spends the rest on the
# round-3 Arm-C flagship (fresh FermiNet-h-stream C ccECP; the continuation
# arms died with the round-2 box swap), (e) exports artifacts.
#
# Usage: nohup bash scripts/queue_r2n.sh <hard_end_epoch> [wait_pid] &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p runs
Q=/root/repo/runs/chip_queue_r2n.log
HARD_END="${1:?hard_end epoch required}"
WAIT_PID="${2:-}"
echo "=== queue_r2n start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

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

# --- (a) re-gate the fast paths under the precision pin -------------------
run_stage probe_forward_real 2400 python -u scripts/probe_forward_real.py
run_stage probe_forward_pair 2400 python -u scripts/probe_forward_pair.py
run_stage probe_fused_dmc 2400 python -u scripts/probe_fused_dmc.py

REAL_LAP=default; PAIR_LAP=default
grep -q "PROBE PASS" runs/probe_forward_real.log 2>/dev/null && REAL_LAP=forward
grep -q "PROBE PASS" runs/probe_forward_pair.log 2>/dev/null && PAIR_LAP=forward
echo "=== gates: real=$REAL_LAP pair=$PAIR_LAP fused_dmc=$(grep -q 'PROBE PASS' runs/probe_fused_dmc.log 2>/dev/null && echo pass || echo fail) ===" >> "$Q"

# --- (b) retrain the diamond twists on the now-trusted backend ------------
for t in a b; do
  if [ -d "runs/diamond_twist_$t" ] && ! [ -e "runs/diamond_twist_${t}_badprec" ]; then
    mv "runs/diamond_twist_$t" "runs/diamond_twist_${t}_badprec"
    echo "=== moved tainted diamond_twist_$t aside ===" >> "$Q"
  fi
done
run_stage diamond_twist_a 5400 python -u scripts/run_diamond_ccecp.py 3500 \
  /root/repo/runs/diamond_twist_a 0.25 0.25 0.25 kfac "$PAIR_LAP"
run_stage diamond_twist_b 5400 python -u scripts/run_diamond_ccecp.py 3500 \
  /root/repo/runs/diamond_twist_b 0.25 -0.25 0.25 kfac "$PAIR_LAP"

# --- (c) fixed-phase DMC + Si --------------------------------------------
run_stage diamond_dmc 7200 python -u scripts/run_diamond_dmc.py \
  /root/repo/runs/diamond_twist_a 0.25 0.25 0.25 40 40 \
  /root/repo/runs/diamond_dmc 0.01

run_stage si_vmc3 9000 python -u scripts/run_si_vmc.py 3000 \
  /root/repo/runs/si_vmc3 "$REAL_LAP"

# --- (d) Arm C: fresh f-stream flagship for the remaining time ------------
now=$(date +%s)
rem=$(( HARD_END - now - 600 ))
if [ "$rem" -gt 3600 ]; then
  iters=$(( rem * 3 / 10 ))
  run_stage c_fstream "$rem" python -u scripts/run_c_ccecp_kfac_fstream.py \
    "$iters" /root/repo/runs/c_kfac_fstream "$REAL_LAP"
else
  echo "=== c_fstream SKIPPED (rem=${rem}s) $(date) ===" >> "$Q"
fi

# --- (e) survive the next box swap ----------------------------------------
bash scripts/export_artifacts.sh >> "$Q" 2>&1
echo "=== queue_r2n finished $(date) ===" >> "$Q"
