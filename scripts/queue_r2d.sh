#!/bin/bash
# Chip queue, part 3 (replaces queue_r2c.sh):
#   1. SPRING continuation of the flagship C trial from runs/c_kfac_big —
#      the KFAC plateau test (exact sample-space natural gradient, batch 1024)
#   2. DMC from whichever trial (KFAC vs SPRING continuation) has the lower
#      robust tail energy
#   3. the two inequivalent 2x2x2 MP twists of the diamond ccECP cell
#      (complex-pairs ansatz) -> physically meaningful TABC average
#   4. Si all-electron retry with the step-rejection guard + halved LR
# Stages respect a hard cutoff so the chip is free before round end.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
Q=/root/repo/runs/chip_queue7.log
CUTOFF="${1:-1787010000}"   # epoch seconds: start no new stage after this
echo "=== queue_r2d start $(date) cutoff=$(date -d @$CUTOFF) ===" >> "$Q"

run_stage () {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  if [ "$(date +%s)" -ge "$CUTOFF" ]; then
    echo "=== $name SKIPPED (past cutoff) $(date) ===" >> "$Q"
    return
  fi
  timeout "$tmo" "$@" > "runs/${name}.log" 2>&1
  echo "=== $name done rc=$? $(date) ===" >> "$Q"
}

run_stage c_spring_big 9000 python -u scripts/run_c_spring_big.py 6000 \
  /root/repo/runs/c_spring_big /root/repo/runs/c_kfac_big

# Pick the better trial for DMC: robust tail energy of each train CSV.
BEST=$(python - <<'EOF'
import numpy as np, csv, os
from aiqmc_tpu.utils.analysis_tools import robust_estimate_energy
def tail_energy(d):
    p = os.path.join(d, "train_states.csv")
    if not os.path.exists(p):
        return np.inf
    E = np.array([float(r["energy"]) for r in csv.DictReader(open(p))])
    E = E[np.isfinite(E) & (E != 0.0)]
    if len(E) < 500:
        return np.inf
    return robust_estimate_energy(E[-2000:])["mean"]
cands = {"/root/repo/runs/c_kfac_big": tail_energy("/root/repo/runs/c_kfac_big"),
         "/root/repo/runs/c_spring_big": tail_energy("/root/repo/runs/c_spring_big")}
best = min(cands, key=cands.get)
import sys; print(best)
print({k: round(v, 5) for k, v in cands.items()}, file=sys.stderr)
EOF
)
echo "=== DMC trial choice: $BEST $(date) ===" >> "$Q"

run_stage c_dmc_big2 4500 python -u scripts/run_c_ccecp_dmc_big.py \
  "$BEST" 60 40 /root/repo/runs/c_dmc_big2 0.02

run_stage diamond_twist_a 4200 python -u scripts/run_diamond_ccecp.py 3500 \
  /root/repo/runs/diamond_twist_a 0.25 0.25 0.25

run_stage diamond_twist_b 4200 python -u scripts/run_diamond_ccecp.py 3500 \
  /root/repo/runs/diamond_twist_b 0.25 -0.25 0.25

run_stage si_vmc2 3600 python -u scripts/run_si_vmc.py 2500 \
  /root/repo/runs/si_vmc2

echo "=== queue_r2d finished $(date) ===" >> "$Q"
