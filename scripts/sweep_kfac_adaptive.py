"""KFAC adaptive-mode sweep on the flagship C ccECP config (round-1 weak #9:
the adaptive lr/damping defaults were tuned on He only).

Four short runs (fixed schedule baseline, adaptive lr, adaptive damping,
both) at (128,32)x4 / 8 det, batch 2048; reports the tail energy of each so
the defaults can be justified on the system class that matters.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/sweep_kfac_adaptive.py [iterations_per_run]
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import c_atom_ccecp

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2500

VARIANTS = {
    "fixed": dict(adaptive_learning_rate=False, adaptive_damping=False),
    "adapt_lr": dict(adaptive_learning_rate=True, adaptive_damping=False),
    "adapt_damp": dict(adaptive_learning_rate=False, adaptive_damping=True),
    "adapt_both": dict(adaptive_learning_rate=True, adaptive_damping=True),
}

results = {}
for name, opts in VARIANTS.items():
    cfg = c_atom_ccecp.get_config()
    with cfg.unlocked():
        cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
        cfg.batch_size = 2048
        cfg.network.hidden_dims = ((128, 32),) * 4
        cfg.network.hidden_dims_ynlm = (16, 16, 16, 16)
        cfg.network.determinants = 8
        cfg.system.pp.quadrature = "icosahedral12"
        cfg.optim.optimizer = "kfac"
        cfg.optim.laplacian = "forward"
        cfg.optim.iterations = iters
        cfg.optim.kfac.lr.rate = 0.05
        cfg.optim.kfac.lr.delay = 1500.0
        for k, v in opts.items():
            setattr(cfg.optim.kfac, k, v)
        cfg.pretrain.iterations = 1000
        cfg.mcmc.tstep = 0.25
        cfg.mcmc.steps = 10
        cfg.mcmc.burn_in = 200
        cfg.log.save_path = f"/root/repo/runs/kfac_sweep_{name}"
        cfg.log.save_frequency = 30.0
        cfg.debug.deterministic = True
        cfg.debug.seed = 29
    result = train_lib.train(cfg)
    tail = result.energies[-max(1, iters // 5):]
    results[name] = (tail.mean(), tail.std() / np.sqrt(len(tail)))
    print(f"[{name}] tail {results[name][0]:.5f} +- {results[name][1]:.5f} Ha")

print("\nSWEEP SUMMARY (C ccECP, %d iters each; UHF -5.3324, exact -5.434):"
      % iters)
for name, (m, s) in results.items():
    print(f"  {name:12s} {m:.5f} +- {s:.5f} Ha")
