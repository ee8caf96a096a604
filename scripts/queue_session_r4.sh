#!/bin/bash
# Round-4 session bootstrap: chains the whole chip campaign with
# wedge-tolerance and per-stage artifact commits.
#
#   1. backend trust gate (retried; aborts physics on 3 failures);
#   2. restore runs/ from committed artifacts (box swaps wipe runs/);
#   3. FLAGSHIP ARM by decision gate:
#        runs/eval_spring_probe2.log FROZEN EVAL <= -5.4176  ->  long SPRING
#        continuation (damping 0.1) from the best trial — probe 2 descended
#        below the KFAC plateau in 700 iters and the frozen eval confirmed;
#        else -> wide-arm KFAC legs (queue_r2s).
#   4. Li excited-state showcase (scripts/run_li_excited_full.py, ~40 min):
#      spectroscopy BASELINE row (excitations, <S^2>, oscillator strengths);
#   5. C2 DMC top-up if runs/c2_dmc has < 40 blocks.
#
# Usage: nohup bash scripts/queue_session_r4.sh <hard_end_epoch> &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_session_r4.log
HARD_END="${1:?hard_end epoch required}"
mkdir -p runs
echo "=== queue_session_r4 start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

GATE_OK=0
for attempt in 1 2 3; do
  timeout 2400 python -u scripts/probe_el_cross_device.py \
    > "runs/probe_trust_r4_a${attempt}.log" 2>&1
  grep -q "CROSS-DEVICE PASS" "runs/probe_trust_r4_a${attempt}.log" && { GATE_OK=1; break; }
  echo "=== trust gate attempt $attempt failed/wedged $(date) ===" >> "$Q"
done
[ "$GATE_OK" -ne 1 ] && { echo "=== TRUST GATE FAILED — no physics ===" >> "$Q"; exit 1; }
echo "=== trust gate PASS ===" >> "$Q"

for run in c_kfac_wide c_kfac_fstream c_spring_probe2 c2_kfac c2_dmc; do
  [ -d "artifacts/$run" ] || continue
  have=$(ls "runs/$run"/qmcjax_ckpt_*.npz 2>/dev/null | sort | tail -1)
  last=$(ls "artifacts/$run"/qmcjax_ckpt_*.npz 2>/dev/null | sort | tail -1)
  [ -n "$last" ] || continue
  if [ -z "$have" ] || [ "$(basename "$last")" \> "$(basename "$have")" ]; then
    mkdir -p "runs/$run" && cp "$last" "runs/$run/" && \
      echo "=== restored $run from $(basename "$last") ===" >> "$Q"
  fi
done

# --- stage 3: flagship arm ---
now=$(date +%s); total=$(( HARD_END - now ))
FLAG_END=$(( now + total * 6 / 10 ))
spring_ok=$(python - <<'PYEOF'
import re
try:
    txt = open("runs/eval_spring_probe2.log").read()
    m = re.search(r"FROZEN EVAL \S+: (-?\d+\.\d+)", txt)
    print("SPRING" if m and float(m.group(1)) <= -5.4176 else "KFAC")
except Exception:
    print("KFAC")
PYEOF
)
echo "=== flagship arm: $spring_ok ===" >> "$Q"
if [ "$spring_ok" = "SPRING" ]; then
  # Legged SPRING continuation from the probe-2 trial with the same
  # watchdog discipline as queue_r2s.
  leg=0
  while true; do
    now=$(date +%s); remaining=$(( FLAG_END - now ))
    [ "$remaining" -lt 900 ] && break
    leg=$(( leg + 1 )); tmo=5400; [ "$tmo" -gt "$remaining" ] && tmo=$remaining
    echo "=== spring leg $leg start tmo=${tmo}s $(date) ===" >> "$Q"
    timeout "$tmo" python -u scripts/run_c_spring_big.py 99999 \
      /root/repo/runs/c_spring_probe2 /root/repo/runs/c_spring_probe2 \
      0.1 0.01 0.99 ferminet 256 > "runs/spring_r4_leg${leg}.log" 2>&1
    echo "=== spring leg $leg ended rc=$? $(date) ===" >> "$Q"
    bash scripts/export_artifacts.sh c_spring_probe2 >> "$Q" 2>&1
    git add artifacts/c_spring_probe2 2>/dev/null && \
      git commit -q -m "Checkpoint SPRING continuation leg $leg" \
        -- artifacts/c_spring_probe2 2>/dev/null || true
  done
else
  bash scripts/queue_r2s.sh "$FLAG_END"
fi

# --- stage 4: Li excited showcase ---
now=$(date +%s); remaining=$(( HARD_END - now - 1500 ))
if [ "$remaining" -ge 2400 ]; then
  tmo=3600; [ "$tmo" -gt "$remaining" ] && tmo=$remaining
  echo "=== li_excited_full start tmo=${tmo}s $(date) ===" >> "$Q"
  timeout "$tmo" python -u scripts/run_li_excited_full.py 6000 2048 \
    /root/repo/runs/li_excited_full > runs/li_excited_full.log 2>&1
  echo "=== li_excited_full done rc=$? $(date) ===" >> "$Q"
  bash scripts/export_artifacts.sh li_excited_full >> "$Q" 2>&1
  git add artifacts/li_excited_full 2>/dev/null && \
    git commit -q -m "Li excited-state showcase artifacts" \
      -- artifacts/li_excited_full 2>/dev/null || true
fi

# --- stage 5: C2 DMC top-up ---
now=$(date +%s); remaining=$(( HARD_END - now - 1500 ))
nblocks=$(python -c "
import csv
try: print(len(list(csv.DictReader(open('runs/c2_dmc/DMC_states.csv')))))
except Exception: print(0)")
if [ "$remaining" -ge 2400 ] && [ "$nblocks" -lt 40 ]; then
  tmo=4500; [ "$tmo" -gt "$remaining" ] && tmo=$remaining
  echo "=== c2_dmc top-up start tmo=${tmo}s (have $nblocks blocks) ===" >> "$Q"
  timeout "$tmo" python -u scripts/run_c2_ccecp_dmc.py /root/repo/runs/c2_kfac \
    60 40 /root/repo/runs/c2_dmc 0.02 forward 2.348 1024 \
    > runs/c2_dmc_r4.log 2>&1
  echo "=== c2_dmc top-up done rc=$? $(date) ===" >> "$Q"
  bash scripts/export_artifacts.sh c2_dmc >> "$Q" 2>&1
  git add artifacts/c2_dmc 2>/dev/null && \
    git commit -q -m "C2 DMC artifacts" -- artifacts/c2_dmc 2>/dev/null || true
fi
echo "=== queue_session_r4 finished $(date) ===" >> "$Q"
