"""C ccECP VMC with the SPRING optimizer — A/B against the KFAC plateau.

Identical system/network/budget to runs/c_kfac5 (-5.41020(17) Ha after 12000
KFAC iterations): (128,32)x4, 8 dets, batch 2048, ECP-RHF pretraining. SPRING
(optim/spring.py) solves the natural gradient exactly in sample space each
step; if the C plateau is optimisation-limited (ROADMAP), this should land
below the KFAC result at equal iterations. ccECP references: UHF -5.3324,
exact -5.434.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_c_ccecp_spring.py [iterations] [save_path]
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import c_atom_ccecp

iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
save_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/runs/c_spring"

cfg = c_atom_ccecp.get_config()
with cfg.unlocked():
    cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
    cfg.batch_size = 2048
    cfg.network.hidden_dims = ((128, 32),) * 4
    cfg.network.hidden_dims_ynlm = (16, 16, 16, 16)
    cfg.network.determinants = 8
    cfg.system.pp.quadrature = "icosahedral12"
    cfg.optim.optimizer = "spring"
    cfg.optim.laplacian = "forward"
    cfg.optim.iterations = iterations
    cfg.optim.spring.lr.rate = 0.02
    cfg.optim.spring.lr.delay = 10000.0
    cfg.optim.spring.damping = 1e-3
    cfg.optim.spring.mu = 0.99
    cfg.pretrain.iterations = 1000
    cfg.mcmc.tstep = 0.25
    cfg.mcmc.steps = 10
    cfg.mcmc.burn_in = 200
    cfg.log.save_path = save_path
    cfg.log.save_frequency = 10.0
    cfg.debug.deterministic = True
    cfg.debug.seed = 29

result = train_lib.train(cfg)
tail = result.energies[-max(1, iterations // 5):]
print("FINAL tail mean %.5f +- %.5f Ha over %d iters (SPRING)"
      % (tail.mean(), tail.std() / np.sqrt(len(tail)), len(tail)))
print("ckpt:", result.ckpt_save_path)
