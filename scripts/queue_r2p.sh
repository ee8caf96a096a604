#!/bin/bash
# Queue r2p: continue the f-stream flagship arm (ROADMAP round-3 decision
# tree, branch "f-stream beats the old 67k plateau" — it does: VMC
# -5.41744(2) @33k iters, DMC -5.41761(2) vs the old plateau's -5.41622(50)).
# Restore-and-continue runs/c_kfac_fstream as far as the budget allows, then
# re-DMC the deeper trial. Forward-Laplacian kinetic everywhere (both chip
# probes PASS under the precision pin — BASELINE.md 2026-08-18).
#
# Usage: nohup bash scripts/queue_r2p.sh <hard_end_epoch> [wait_pid] &
#        echo $! > /tmp/queue_r2p.pid
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_r2p.log
HARD_END="${1:?hard_end epoch required}"
WAIT_PID="${2:-}"
echo "=== queue_r2p start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

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

now=$(date +%s)
total=$(( HARD_END - now - 1200 ))
# Reserve 80 min for the final DMC; the rest is training. ~1.9 it/s at
# batch 4096 with the forward Laplacian (measured over the 33k r2o leg).
train_budget=$(( total - 4800 ))
iters=$(( train_budget * 19 / 10 ))
run_stage c_fstream3 "$train_budget" python -u \
  scripts/run_c_ccecp_kfac_fstream.py "$iters" /root/repo/runs/c_kfac_fstream

# DMC from the deeper trial (auto-detects the EMA params). forward kinetic:
# probe_forward_real PASSes on this toolchain (runs/probe_forward_real.log).
run_stage c_dmc_fstream2 4800 python -u scripts/run_c_ccecp_dmc_big.py \
  /root/repo/runs/c_kfac_fstream 60 40 /root/repo/runs/c_dmc_fstream2 0.02 \
  ferminet forward

bash scripts/export_artifacts.sh >> "$Q" 2>&1
echo "=== queue_r2p finished $(date) ===" >> "$Q"
