#!/bin/bash
# Chip queue, part 2 (replaces the tail of queue_r2b.sh):
#   1. let the in-flight flagship C continuation run until DEADLINE_FLAGSHIP,
#      then stop it (checkpoints land every ~10 min, nothing is lost)
#   2. DMC from the improved flagship trial
#   3. train the two inequivalent 2x2x2 MP twists of the diamond ccECP cell
#      (complex-pairs ansatz) -> a physically meaningful TABC average
#      (weights 2:6 for the same-sign vs mixed-sign twist classes of the fcc
#      reciprocal lattice)
#   4. Si all-electron retry with the step-rejection guard + halved LR
# Stages respect a hard cutoff so the chip is free before round end.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue6.log
FLAGSHIP_PID="${1:-}"          # python PID of the running flagship
DEADLINE_FLAGSHIP="${2:-}"     # epoch seconds: stop flagship here
CUTOFF="${3:-}"                # epoch seconds: start no new stage after this
echo "=== queue_r2c start $(date) flagship=$FLAGSHIP_PID ===" >> "$Q"

if [ -n "$FLAGSHIP_PID" ]; then
  while kill -0 "$FLAGSHIP_PID" 2>/dev/null; do
    if [ "$(date +%s)" -ge "$DEADLINE_FLAGSHIP" ]; then
      echo "=== flagship deadline: stopping $FLAGSHIP_PID $(date) ===" >> "$Q"
      kill "$FLAGSHIP_PID" 2>/dev/null
      sleep 20
      kill -9 "$FLAGSHIP_PID" 2>/dev/null
      break
    fi
    sleep 60
  done
  sleep 10
  echo "=== flagship stage over $(date) ===" >> "$Q"
fi

run_stage () {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ "$(date +%s)" -ge "$CUTOFF" ]; then
    echo "=== $name SKIPPED (past cutoff) $(date) ===" >> "$Q"
    return
  fi
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name done rc=$? $(date) ===" >> "$Q"
}

run_stage c_dmc_big2 4500 python -u scripts/run_c_ccecp_dmc_big.py \
  /root/repo/runs/c_kfac_big 60 40 /root/repo/runs/c_dmc_big2 0.02

run_stage diamond_twist_a 4200 python -u scripts/run_diamond_ccecp.py 3500 \
  /root/repo/runs/diamond_twist_a 0.25 0.25 0.25

run_stage diamond_twist_b 4200 python -u scripts/run_diamond_ccecp.py 3500 \
  /root/repo/runs/diamond_twist_b 0.25 -0.25 0.25

run_stage si_vmc2 3600 python -u scripts/run_si_vmc.py 2500 \
  /root/repo/runs/si_vmc2

echo "=== queue_r2c finished $(date) ===" >> "$Q"
