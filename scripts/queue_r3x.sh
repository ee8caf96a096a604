#!/bin/bash
# Round-3 corrected end-window (replaces the tail of queue_r3w, whose bash
# was stopped after its precision-A/B + Pallas stages ran early and overlapped
# the relaunched C2 leg):
#   0. wait for the in-flight SPRING probe (started by r3w) to exit;
#   1. probe_forward_selective — correctness gate for the tangent-precision
#      lever (r3w's edited stage never executed: bash had already read past);
#   2. C2 DMC retry at batch 1024 (batch-2048 forward program OOM'd HBM);
#      on failure, retry once with the batched-tangent laplacian;
#   3. clean precision A/B re-run (the 18:28 numbers overlapped the C2 leg);
#   4. artifacts + pathspec commits. All stages bounded; chip free >= 25 min
#      before HARD_END for the driver bench.
# Usage: nohup bash scripts/queue_r3x.sh <hard_end_epoch> <spring_pid> &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_r3x.log
HARD_END="${1:?hard_end epoch required}"
SPRING_PID="${2:-}"
echo "=== queue_r3x start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

if [ -n "$SPRING_PID" ]; then
  while kill -0 "$SPRING_PID" 2>/dev/null; do sleep 30; done
  echo "=== spring probe exited $(date) ===" >> "$Q"
fi

run_stage () {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  local now remaining
  now=$(date +%s); remaining=$(( HARD_END - now - 1500 ))
  if [ "$remaining" -lt 600 ]; then
    echo "=== $name SKIPPED (${remaining}s left) ===" >> "$Q"
    return 1
  fi
  [ "$tmo" -gt "$remaining" ] && tmo=$remaining
  echo "=== $name start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  local rc=$?
  echo "=== $name done rc=$rc $(date) ===" >> "$Q"
  return $rc
}

run_stage probe_forward_selective 1800 env \
  AIQMC_FWDLAP_TANGENT_PRECISION=default \
  python -u scripts/probe_forward_real.py

if ! run_stage c2_dmc_b1024 4500 python -u scripts/run_c2_ccecp_dmc.py \
    /root/repo/runs/c2_kfac 60 40 /root/repo/runs/c2_dmc 0.02 forward \
    2.348 1024; then
  if grep -q "Ran out of memory" runs/c2_dmc_b1024.log 2>/dev/null; then
    run_stage c2_dmc_b1024_default 4500 python -u \
      scripts/run_c2_ccecp_dmc.py /root/repo/runs/c2_kfac 60 40 \
      /root/repo/runs/c2_dmc 0.02 default 2.348 1024
  fi
fi

run_stage precision_ab_clean 3000 python -u scripts/probe_precision_ab.py

bash scripts/export_artifacts.sh c2_kfac c2_dmc c_spring_probe2 >> "$Q" 2>&1
git add artifacts/c2_kfac artifacts/c2_dmc artifacts/c_spring_probe2 2>/dev/null
git commit -q -m "Round-3 end-window artifacts (C2 DMC, SPRING probe 2)" \
  -- artifacts/c2_kfac artifacts/c2_dmc artifacts/c_spring_probe2 \
  2>/dev/null || true
echo "=== queue_r3x finished $(date) ===" >> "$Q"
