"""BASELINE config #5: periodic diamond-C primitive cell (12 e-), PBC ansatz
+ 3D Ewald under VMC.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_diamond_vmc.py [iterations] [save_path] [optimizer]
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import diamond

iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
save_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/runs/diamond_vmc"
optimizer = sys.argv[3] if len(sys.argv) > 3 else "kfac"

cfg = diamond.get_config()
with cfg.unlocked():
    cfg.batch_size = 1024
    cfg.network.hidden_dims = ((64, 16),) * 3
    cfg.network.hidden_dims_ynlm = (16, 16, 16)
    cfg.network.determinants = 4
    cfg.network.pbc_smooth_r = True
    cfg.optim.optimizer = optimizer
    cfg.optim.iterations = iterations
    cfg.optim.kfac.lr.rate = 0.05
    cfg.optim.kfac.lr.delay = 3000.0
    cfg.mcmc.tstep = 0.05
    cfg.mcmc.steps = 10
    cfg.mcmc.burn_in = 200
    cfg.system.ewald.truncation_limit = 5
    cfg.log.save_path = save_path
    cfg.log.save_frequency = 10.0
    cfg.debug.deterministic = True
    cfg.debug.seed = 37

result = train_lib.train(cfg)
tail = result.energies[-max(1, iterations // 5):]
print("FINAL tail mean %.5f +- %.5f Ha over %d iters"
      % (tail.mean(), tail.std() / np.sqrt(len(tail)), len(tail)))
print("ckpt:", result.ckpt_save_path)
