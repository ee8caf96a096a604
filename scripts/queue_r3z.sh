#!/bin/bash
# Round-3 overnight continuation (session of 2026-08-19 21:14 UTC).
# Decision state at launch: SPRING probe-2 frozen eval -5.41757(12) — healthy
# continuation but only ~0.1 mHa below the KFAC plateau and ABOVE the -5.4176
# gate, so the flagship window goes to the WIDE KFAC arm (capacity is the
# binding constraint; wide arm at t=14.3k, EW -5.41706(18) and descending).
#
#   1. backend trust gate (retried; cache warm on this box);
#   2. wide-arm KFAC legs (queue_r2s: wedge-tolerant, per-leg artifact commits)
#      until HARD_END - 5700;
#   3. Li excited-state showcase (spectroscopy BASELINE row) — the summary is
#      recomputed from the CSV afterwards so a timeout cannot lose it;
#   4. leftover chip time returns to wide legs.
#
# Usage: nohup bash scripts/queue_r3z.sh <hard_end_epoch> &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_r3z.log
HARD_END="${1:?hard_end epoch required}"
mkdir -p runs
echo "=== queue_r3z start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

GATE_OK=0
for attempt in 1 2 3; do
  timeout 1800 python -u scripts/probe_el_cross_device.py \
    > "runs/probe_trust_r3z_a${attempt}.log" 2>&1
  grep -q "CROSS-DEVICE PASS" "runs/probe_trust_r3z_a${attempt}.log" && { GATE_OK=1; break; }
  echo "=== trust gate attempt $attempt failed/wedged $(date) ===" >> "$Q"
done
[ "$GATE_OK" -ne 1 ] && { echo "=== TRUST GATE FAILED — no physics ===" >> "$Q"; exit 1; }
echo "=== trust gate PASS $(date) ===" >> "$Q"

# --- stage 2: wide flagship legs ---
FLAG_END=$(( HARD_END - 5700 ))
bash scripts/queue_r2s.sh "$FLAG_END"

# --- stage 3: Li excited showcase ---
now=$(date +%s); remaining=$(( HARD_END - now - 1500 ))
if [ "$remaining" -ge 1800 ]; then
  tmo=3900; [ "$tmo" -gt "$remaining" ] && tmo=$remaining
  echo "=== li_excited_full start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" python -u scripts/run_li_excited_full.py 6000 2048 \
    /root/repo/runs/li_excited_full > runs/li_excited_full.log 2>&1
  echo "=== li_excited_full done rc=$? $(date) ===" >> "$Q"
  # Recompute the spectroscopy summary from the CSV (timeout-proof).
  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python - >> runs/li_excited_full.log 2>&1 <<'PYEOF'
import json
from aiqmc_tpu.utils import analysis_tools
s = analysis_tools.excited_state_summary(
    "/root/repo/runs/li_excited_full/train_states.csv", states=3)
print("SUMMARY " + json.dumps(s))
PYEOF
  bash scripts/export_artifacts.sh li_excited_full >> "$Q" 2>&1
  git add artifacts/li_excited_full 2>/dev/null && \
    git commit -q -m "Li excited-state showcase artifacts" \
      -- artifacts/li_excited_full 2>/dev/null || true
fi

# --- stage 4: leftover chip time back to the wide arm ---
now=$(date +%s)
if [ $(( HARD_END - now )) -ge 3300 ]; then
  bash scripts/queue_r2s.sh "$HARD_END"
fi
echo "=== queue_r3z finished $(date) ===" >> "$Q"
