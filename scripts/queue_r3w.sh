#!/bin/bash
# Round-3 END-OF-ROUND chip window: runs after queue_session releases the
# chip (~20:40). Closes the three measured VERDICT items that need hardware:
#   1. precision-pin throughput A/B  (scripts/probe_precision_ab.py)
#   2. Pallas-vs-XLA slogdet verdict (scripts/bench_slogdet_pallas.py)
#   3. SPRING plateau-continuation arm 2, damping 0.1, from the surviving
#      f-stream trial (runs/c_spring_probe2)
# then spends whatever remains on one more wide flagship leg, artifact-
# committed. Leaves >=20 min before HARD_END for the driver's bench.
#
# Usage: nohup bash scripts/queue_r3w.sh <hard_end_epoch> > /dev/null 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_r3w.log
HARD_END="${1:?hard_end epoch required}"
echo "=== queue_r3w start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

# Wait for the session queue to release the chip.
while ! grep -q "queue_session finished" runs/chip_queue_session.log 2>/dev/null; do
  if [ "$(date +%s)" -ge $(( HARD_END - 1500 )) ]; then
    echo "=== hard end reached while waiting for the chip ===" >> "$Q"
    exit 0
  fi
  sleep 60
done
echo "=== chip free $(date) ===" >> "$Q"

run_stage () {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  local now remaining
  now=$(date +%s); remaining=$(( HARD_END - now - 1200 ))
  if [ "$remaining" -lt 600 ]; then
    echo "=== $name SKIPPED (${remaining}s left) ===" >> "$Q"
    return 1
  fi
  [ "$tmo" -gt "$remaining" ] && tmo=$remaining
  echo "=== $name start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name done rc=$? $(date) ===" >> "$Q"
}

run_stage probe_precision_ab 3600 python -u scripts/probe_precision_ab.py
# Correctness gate for the selective arm measured above: the forward kinetic
# with AIQMC_FWDLAP_TANGENT_PRECISION=default vs the PINNED batched-tangent
# kinetic, on-chip, same inputs. PASS here (+ the probe_precision_ab arm-C
# recovery number) is what a production flip of the variable requires.
run_stage probe_forward_selective 2400 env \
  AIQMC_FWDLAP_TANGENT_PRECISION=default \
  python -u scripts/probe_forward_real.py
run_stage bench_slogdet_pallas 2400 python -u scripts/bench_slogdet_pallas.py
# Restore source: runs/c_kfac_fstream if the session kept it, else artifacts.
SPRING_FROM=/root/repo/runs/c_kfac_fstream
ls "$SPRING_FROM"/qmcjax_ckpt_*.npz > /dev/null 2>&1 || \
  SPRING_FROM=/root/repo/artifacts/c_kfac_fstream
run_stage c_spring_probe2 3600 python -u scripts/run_c_spring_big.py 700 \
  /root/repo/runs/c_spring_probe2 "$SPRING_FROM" 0.1 0.01 0.99 ferminet 256

# Remaining time: one more wide flagship leg (restore-and-continue).
now=$(date +%s); remaining=$(( HARD_END - now - 1500 ))
if [ "$remaining" -ge 1500 ]; then
  echo "=== extra wide leg tmo=${remaining}s $(date) ===" >> "$Q"
  timeout "$remaining" python -u scripts/run_c_ccecp_kfac_fstream.py 99999 \
    /root/repo/runs/c_kfac_wide forward 16 512 > runs/c_wide_r3w.log 2>&1
  echo "=== extra wide leg ended rc=$? $(date) ===" >> "$Q"
fi
bash scripts/export_artifacts.sh c_kfac_wide c_spring_probe2 >> "$Q" 2>&1
git add artifacts/c_kfac_wide artifacts/c_spring_probe2 2>/dev/null
git commit -q -m "Checkpoint r3w window artifacts" \
  -- artifacts/c_kfac_wide artifacts/c_spring_probe2 2>/dev/null || true
echo "=== queue_r3w finished $(date) ===" >> "$Q"
