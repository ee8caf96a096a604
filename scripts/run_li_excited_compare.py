"""Li 3-state NES-VMC: shared-parameter vs legacy K-copy construction.

VERDICT round-2 item 5's done-condition: a Li 3-state run whose energies
match the legacy implementation at ~1/K the parameter count. Both arms run
the SAME config (aiqmc_tpu.configs.li_excited) except for
system.excited_param_copies; per-state energies come from the NES energy
matrix diagonal (train_states.csv energy_state_k columns).

Exact targets (Li): 1s^2 2s (2S) -2.17803; 1s^2 2p (2P) -2.12384;
1s^2 3s (2S) -2.06127 Ha (NIST; the K=3 ansatz targets these three).

Usage (CPU validation):
  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= PYTHONPATH=/root/repo \
    python -u scripts/run_li_excited_compare.py [iters] [batch]
Chip run: the usual TPU env (see CLAUDE.md), larger iters/batch.
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import li_excited

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 512


def run(arm: str, param_copies: bool):
    cfg = li_excited.get_config()
    with cfg.unlocked():
        cfg.system.excited_param_copies = param_copies
        cfg.batch_size = batch
        cfg.optim.iterations = iters
        cfg.optim.optimizer = "kfac" if not param_copies else "adam"
        cfg.mcmc.steps = 10
        cfg.mcmc.burn_in = 100
        cfg.network.hidden_dims = ((32, 8), (32, 8), (32, 8))
        cfg.network.hidden_dims_ynlm = (8, 8, 8)
        cfg.network.determinants = 4
        cfg.debug.deterministic = True
        cfg.log.save_path = f"/root/repo/runs/li_excited_{arm}"
        cfg.log.save_frequency = 30.0
    result = train_lib.train(cfg)
    import jax
    n_params = sum(int(x.size)
                   for x in jax.tree_util.tree_leaves(result.params))
    tail = result.energies[-max(1, iters // 4):]
    print(f"[{arm}] params={n_params}  E_total tail "
          f"{tail.mean():.5f} +- {tail.std() / np.sqrt(len(tail)):.5f} Ha")
    # Per-state columns from the CSV.
    import csv as csv_mod
    import os
    with open(os.path.join(result.ckpt_save_path, "train_states.csv")) as f:
        rows = list(csv_mod.DictReader(f))
    k = 0
    states = []
    while f"energy_state_{k}" in rows[0]:
        vals = np.array([float(r[f"energy_state_{k}"])
                         for r in rows[-max(1, iters // 4):]])
        states.append(vals.mean())
        k += 1
    print(f"[{arm}] per-state tail means:",
          " ".join(f"{v:.5f}" for v in states),
          "(exact -2.17803 -2.12384 -2.06127)")
    return n_params, tail.mean(), states


if __name__ == "__main__":
    n_s, e_s, st_s = run("shared", False)
    n_l, e_l, st_l = run("legacy", True)
    print(f"param ratio shared/legacy = {n_s / n_l:.3f} (target ~1/3 + "
          "orbital-head overhead)")
    print(f"total-energy difference = {abs(e_s - e_l) * 1000:.2f} mHa")
