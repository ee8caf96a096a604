"""Valence ccECP diamond VMC (BASELINE config #5, physically comparable
variant): 2-atom primitive cell, 8 valence electrons, Ewald(Z_eff=4) +
minimum-image ccECP channels (hamiltonian/pp_pbc.py).

Optionally at a twist: pass a fractional twist as three trailing floats
(requires the complex-pairs ansatz, which runs on the TPU).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_diamond_ccecp.py [iterations] [save_path] [tx ty tz] \
           [optimizer] [laplacian]

optimizer: kfac (default) or spring — the complex-pair SPRING stacked solve
(optim/spring.py), ~3x KFAC's iteration rate at this batch on the flagship.
laplacian (twist branch only): default | forward — pass "forward" ONLY after
scripts/probe_forward_pair.py passes on the current chip toolchain (~2.2x
local energy on this config; axon miscompile history).
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import diamond_ccecp

iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
save_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/runs/diamond_ccecp"
twist = (tuple(float(v) for v in sys.argv[3:6]) if len(sys.argv) > 5
         else (0.0, 0.0, 0.0))
optimizer = sys.argv[6] if len(sys.argv) > 6 else "kfac"
twist_laplacian = sys.argv[7] if len(sys.argv) > 7 else "default"

cfg = diamond_ccecp.get_config()
with cfg.unlocked():
    cfg.batch_size = 1024
    cfg.network.hidden_dims = ((64, 16),) * 3
    cfg.network.hidden_dims_ynlm = (16, 16, 16)
    cfg.network.determinants = 4
    cfg.network.pbc_smooth_r = True
    cfg.system.twist = twist
    if any(t != 0.0 for t in twist):
        cfg.network.complex_orbitals = True
        cfg.network.complex_pairs = True   # TPU-safe complex representation
        cfg.optim.laplacian = twist_laplacian
    else:
        cfg.optim.laplacian = "forward"
    cfg.optim.optimizer = optimizer
    cfg.optim.iterations = iterations
    cfg.optim.kfac.lr.rate = 0.05
    cfg.optim.kfac.lr.delay = 3000.0
    cfg.mcmc.tstep = 0.25
    cfg.mcmc.steps = 10
    cfg.mcmc.burn_in = 200
    cfg.log.save_path = save_path
    cfg.log.save_frequency = 10.0
    cfg.debug.deterministic = True
    cfg.debug.seed = 41

result = train_lib.train(cfg)
tail = result.energies[-max(1, iterations // 5):]
print("FINAL tail mean %.5f +- %.5f Ha over %d iters (twist %s)"
      % (tail.mean(), tail.std() / np.sqrt(len(tail)), len(tail), twist))
print("ckpt:", result.ckpt_save_path)
