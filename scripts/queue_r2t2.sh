#!/bin/bash
# Queue r2t2: DMC the wide flagship trial once queue r2s's training legs end —
# WEDGE-TOLERANT edition (replaces queue_r2t.sh): the DMC stage runs as a
# loop of legs watched by a DMC_states.csv staleness monitor, so a host wedge
# burns <=25 min of chip instead of the stage's whole timeout. Restart is
# safe since the driver restores from its own checkpoints (params are already
# the EMA trial) and appends to the block CSV.
#
# Usage: nohup bash scripts/queue_r2t2.sh <hard_end_epoch> [wait_pid] &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_r2t2.log
HARD_END="${1:?hard_end epoch required}"
WAIT_PID="${2:-}"
SAVE=/root/repo/runs/c_dmc_wide
CSV="$SAVE/DMC_states.csv"
STALE_S=1500   # first block needs compile (~6 min) + E_init scan
BUDGET_S=9000  # total DMC wall budget across legs
echo "=== queue_r2t2 start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "=== wait_pid $WAIT_PID exited $(date) ===" >> "$Q"
fi

tpu_ok () {
  timeout 180 python -c "import jax; jax.devices(); import jax.numpy as jnp; jnp.ones(4).sum().block_until_ready()" > /dev/null 2>&1
}

DMC_START=$(date +%s)
leg=0
while true; do
  now=$(date +%s)
  remaining=$(( HARD_END - now - 1500 ))
  spent=$(( now - DMC_START ))
  [ "$remaining" -lt 900 ] && break
  [ "$spent" -gt "$BUDGET_S" ] && break
  if ! tpu_ok; then
    echo "=== tpu down, waiting $(date) ===" >> "$Q"
    sleep 120
    continue
  fi
  leg=$(( leg + 1 ))
  tmo=$(( BUDGET_S - spent ))
  [ "$tmo" -gt "$remaining" ] && tmo=$remaining
  echo "=== c_dmc_wide leg $leg start tmo=${tmo}s $(date) ===" >> "$Q"
  python -u scripts/run_c_ccecp_dmc_big.py \
    /root/repo/runs/c_kfac_wide 60 40 "$SAVE" 0.02 \
    ferminet forward 16 512 > "runs/c_dmc_wide_leg${leg}.log" 2>&1 &
  PID=$!
  START=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    if [ $(( now - START )) -gt "$tmo" ]; then
      echo "=== dmc leg $leg TIMEOUT, killing $(date) ===" >> "$Q"
      kill "$PID" 2>/dev/null; sleep 10; kill -9 "$PID" 2>/dev/null
      break
    fi
    if [ -f "$CSV" ]; then
      age=$(( now - $(stat -c %Y "$CSV") ))
    else
      age=$(( now - START ))
    fi
    if [ "$age" -gt "$STALE_S" ]; then
      echo "=== dmc leg $leg STALLED (csv ${age}s old), killing $(date) ===" >> "$Q"
      kill "$PID" 2>/dev/null; sleep 10; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
  rc=$?
  echo "=== dmc leg $leg ended rc=$rc $(date) ===" >> "$Q"
  # A clean exit means all 60 blocks ran — done.
  [ "$rc" -eq 0 ] && break
done

bash scripts/export_artifacts.sh c_kfac_wide c_dmc_wide >> "$Q" 2>&1
echo "=== queue_r2t2 finished $(date) ===" >> "$Q"
