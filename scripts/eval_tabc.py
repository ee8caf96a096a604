"""Twist-averaged evaluation of a trained periodic checkpoint (TABC).

Evaluates the checkpointed wavefunction at every twist of an n x n x n
Monkhorst-Pack grid (frozen parameters, optimizer="none") and averages —
removing the Gamma-point momentum-quantisation finite-size error. Works on
Gamma-trained REAL checkpoints (sign -> angle + plane-wave boost,
pbc/twist.py real_to_angle; param tree unchanged, so the restore is exact).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/eval_tabc.py <ckpt_dir> [n_grid] [iterations] [config] \
           [laplacian]
       # config: diamond_ccecp (default) | diamond
       # laplacian: default | forward — "forward" (pair forward Laplacian,
       # ~2x kinetic) ONLY after scripts/probe_forward_pair.py passes on
       # the current chip toolchain.
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.pbc import twist as twist_lib

ckpt = sys.argv[1]
n_grid = int(sys.argv[2]) if len(sys.argv) > 2 else 2
iterations = int(sys.argv[3]) if len(sys.argv) > 3 else 400
config_name = sys.argv[4] if len(sys.argv) > 4 else "diamond_ccecp"
laplacian = sys.argv[5] if len(sys.argv) > 5 else "default"

if config_name == "diamond":
    from aiqmc_tpu.configs import diamond as config_mod
else:
    from aiqmc_tpu.configs import diamond_ccecp as config_mod

twists = twist_lib.monkhorst_pack_twists(n_grid)
results = []
for i, theta in enumerate(twists):
    cfg = config_mod.get_config()
    with cfg.unlocked():
        cfg.batch_size = 1024
        cfg.network.hidden_dims = ((64, 16),) * 3
        cfg.network.hidden_dims_ynlm = (16, 16, 16)
        cfg.network.determinants = 4
        cfg.network.pbc_smooth_r = True
        cfg.system.twist = tuple(float(t) for t in theta)
        cfg.optim.optimizer = "none"
        cfg.optim.laplacian = laplacian
        cfg.optim.iterations = iterations
        cfg.mcmc.tstep = 0.25
        cfg.mcmc.steps = 10
        cfg.mcmc.burn_in = 200
        cfg.log.restore_path = ckpt
        cfg.log.save_path = f"/tmp/tabc_eval_{i}"
        cfg.debug.deterministic = True
        cfg.debug.seed = 100 + i
    result = train_lib.train(cfg)
    tail = result.energies[-max(1, iterations // 2):]
    m, s = tail.mean(), tail.std() / np.sqrt(len(tail))
    results.append((m, s))
    print(f"twist {np.array2string(theta, precision=3)}: "
          f"{m:.5f} +- {s:.5f} Ha")

means = np.array([m for m, _ in results])
errs = np.array([s for _, s in results])
tabc_mean = means.mean()
tabc_err = np.sqrt(np.sum(errs ** 2)) / len(errs)
print(f"\nTABC average over {len(twists)} twists: "
      f"{tabc_mean:.5f} +- {tabc_err:.5f} Ha  "
      f"(Gamma-only finite-size spread: {np.ptp(means):.5f} Ha)")
