#!/bin/bash
# One-command session bootstrap for the chip campaign (round 2+ continuous
# build). Chains, with wedge-tolerance and per-stage artifact commits:
#
#   1. backend trust gate (scripts/probe_el_cross_device.py) — ABORTS the
#      physics stages if it fails (2026-08-18 bf16-precision incident);
#   2. restore runs/ from committed artifacts (box swaps wipe runs/);
#   3. wide flagship arm legs (queue_r2s) until WIDE_END;
#   4. DMC of the wide trial (queue_r2t) if VMC beat the f-stream row;
#   5. C2 rebuild + DMC (queue_r2u) with whatever time remains.
#
# Usage: nohup bash scripts/queue_session.sh <hard_end_epoch> > /dev/null 2>&1 &
#   hard_end_epoch: unix time when the chip must be FREE (leave >=15 min
#   before the driver's round-end bench).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue_session.log
HARD_END="${1:?hard_end epoch required}"
mkdir -p runs
echo "=== queue_session start $(date) hard_end=$(date -d @$HARD_END) ===" >> "$Q"

# --- stage 1: backend trust gate (cold-cache compiles can exceed 20 min) ---
timeout 1800 python -u scripts/probe_el_cross_device.py \
  > runs/probe_trust_session.log 2>&1
if ! grep -q "CROSS-DEVICE PASS" runs/probe_trust_session.log; then
  echo "=== TRUST GATE FAILED — no physics stages (see probe_trust_session.log) ===" >> "$Q"
  exit 1
fi
echo "=== trust gate PASS $(date) ===" >> "$Q"

# --- stage 2: restore runs/ from committed artifacts ---
for run in c_kfac_wide c_kfac_fstream c2_kfac; do
  if [ -d "artifacts/$run" ] && [ ! -e "runs/$run" ]; then
    mkdir -p "runs/$run"
    last=$(ls "artifacts/$run"/qmcjax_ckpt_*.npz 2>/dev/null | sort | tail -1)
    [ -n "$last" ] && cp "$last" "runs/$run/" && \
      echo "=== restored $run from $(basename "$last") ===" >> "$Q"
  fi
done

# --- stages 3-5: split remaining time (wide 50%, C2 the rest incl. DMC) ---
now=$(date +%s)
total=$(( HARD_END - now ))
if [ "$total" -lt 3600 ]; then
  echo "=== <1h left after gate: wide legs only ===" >> "$Q"
  bash scripts/queue_r2s.sh "$HARD_END"
else
  WIDE_END=$(( now + total / 2 ))
  bash scripts/queue_r2s.sh "$WIDE_END"
  # DMC the wide trial only once its VMC beats the completed f-stream DMC
  # row (-5.41761); the CSV check mirrors ROADMAP item 3.
  best=$(python - <<'EOF'
import csv, sys
try:
    rows = list(csv.DictReader(open("runs/c_kfac_wide/train_states.csv")))
    tail = [float(r["energy"]) for r in rows[-1500:]]
    print(sum(tail) / max(1, len(tail)))
except Exception:
    print("nan")
EOF
)
  echo "=== wide tail mean: $best ===" >> "$Q"
  case "$best" in
    -5.418*|-5.419*|-5.42*|-5.43*)
      bash scripts/queue_r2t.sh "$(( $(date +%s) + 7800 < HARD_END ? $(date +%s) + 7800 : HARD_END ))" ;;
    *) echo "=== wide VMC has not beaten f-stream DMC row; skip wide DMC ===" >> "$Q" ;;
  esac
  bash scripts/queue_r2u.sh "$HARD_END"
fi
echo "=== queue_session finished $(date) ===" >> "$Q"
