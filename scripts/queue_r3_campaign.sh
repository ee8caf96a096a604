#!/bin/bash
# Round-3 chip campaign: the flagship residual is OPTIMISATION (BASELINE.md —
# published FermiNet-class VMC -5.4254 needs ~2e5 iterations; runs/c_kfac_big
# plateaus at -5.4158 by ~58k), so round 3 spends the chip on one long
# restore-and-continue training campaign plus a final DMC.
#
# Usage: nohup bash scripts/queue_r3_campaign.sh <hard_end_epoch> [wait_pid] &
#        echo $! > /tmp/queue_r3.pid
#
# Decision point (check BEFORE launching): if runs/c_spring_probe descended
# below the KFAC plateau with sane variance, flip OPTIMIZER=spring below —
# the probe validates the HIGHEST-precision fix on hardware.
#
# Stage budget: everything is clamped to HARD_END minus a 20-min margin so
# the chip is free for the driver's round-end bench. Checkpoints land every
# ~10 min; killing a stage at its timeout loses nothing (restore-and-continue).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_r3.log
HARD_END="${1:?hard_end epoch required}"
WAIT_PID="${2:-}"
OPTIMIZER="${OPTIMIZER:-kfac}"
echo "=== queue_r3_campaign start $(date) hard_end=$(date -d @$HARD_END) opt=$OPTIMIZER ===" >> "$Q"

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "=== prior chip job $WAIT_PID exited $(date) ===" >> "$Q"
fi

run_stage () {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  local now remaining
  now=$(date +%s)
  remaining=$(( HARD_END - now - 1200 ))
  if [ "$remaining" -lt 900 ]; then
    echo "=== $name SKIPPED (only ${remaining}s left) $(date) ===" >> "$Q"
    return
  fi
  if [ "$tmo" -gt "$remaining" ]; then tmo=$remaining; fi
  echo "=== $name start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name done rc=$? $(date) ===" >> "$Q"
}

# Cheap toolchain probes first (~15 min each, cached compiles): gate the
# pair forward Laplacian for PBC/twist scripts (scripts/probe_forward_pair.py
# prints PASS/FAIL) and re-test the fused one-program DMC shape on the
# current stack (ROADMAP: failed on the 2026-08 toolchain).
run_stage probe_forward_pair 1800 python -u scripts/probe_forward_pair.py
run_stage probe_fused_dmc_r3 1800 python -u scripts/probe_fused_dmc.py

now=$(date +%s)
total=$(( HARD_END - now - 1200 ))
# Reserve 90 min for the final DMC; everything before that is training.
# (Diamond fixed-phase DMC — scripts/run_diamond_dmc.py from the trained
# twist checkpoints — is interactive round-3 work, not queued here.)
train_budget=$(( total - 5400 ))

if [ "$OPTIMIZER" = "spring" ]; then
  # ~1.2 it/s at batch 1024 flagship capacity.
  iters=$(( train_budget * 12 / 10 ))
  run_stage c_spring_campaign "$train_budget" python -u \
    scripts/run_c_spring_big.py "$iters" \
    /root/repo/runs/c_spring_campaign /root/repo/runs/c_kfac_big
  TRIAL=/root/repo/runs/c_spring_campaign
else
  # ~0.55 it/s at batch 2048 flagship capacity; restore scans save_path, so
  # reusing runs/c_kfac_big continues from the latest checkpoint.
  # cfg.optim.iterations counts ADDITIONAL steps from the restored t
  # (train.py: range(t_init, t_init + iterations)).
  iters=$(( train_budget * 55 / 100 ))
  run_stage c_kfac_campaign "$train_budget" python -u \
    scripts/run_c_ccecp_kfac_big.py "$iters" /root/repo/runs/c_kfac_big
  TRIAL=/root/repo/runs/c_kfac_big
fi

run_stage c_dmc_campaign 5400 python -u scripts/run_c_ccecp_dmc_big.py \
  "$TRIAL" 60 40 /root/repo/runs/c_dmc_campaign 0.02

# Reference-flagship-molecule arm (its committed DMC example IS C2): rebuild
# the C2 VMC trial (the round-2 checkpoint died in the box swap) and DMC it.
# run_stage skips these automatically when the budget is spent.
run_stage c2_kfac_r3 7200 python -u scripts/run_c2_ccecp_kfac.py 9000 \
  /root/repo/runs/c2_kfac
run_stage c2_dmc_r3 4500 python -u scripts/run_c2_ccecp_dmc.py \
  /root/repo/runs/c2_kfac 60 40 /root/repo/runs/c2_dmc 0.02

bash scripts/export_artifacts.sh >> "$Q" 2>&1
echo "=== queue_r3_campaign finished $(date) ===" >> "$Q"
