"""BASELINE config #2: CH4 all-electron VMC with native KFAC + RHF pretraining.

References: CH4 exact -40.515 Ha, HF limit ~-40.22 (upstream FermiNet reaches
chemical accuracy of the exact value with (256,32)x4/16det and ~2e5 iters;
this run is sized for a single-chip session).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_ch4_kfac.py [iterations] [save_path]
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import ch4

iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
save_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/runs/ch4_kfac"

cfg = ch4.get_config()
with cfg.unlocked():
    cfg.batch_size = 2048
    cfg.network.hidden_dims = ((128, 32),) * 4
    cfg.network.hidden_dims_ynlm = (16, 16, 16, 16)
    cfg.network.determinants = 8
    cfg.optim.optimizer = "kfac"
    cfg.optim.laplacian = "forward"
    cfg.optim.iterations = iterations
    cfg.optim.kfac.lr.rate = 0.05
    cfg.optim.kfac.lr.delay = 3000.0
    cfg.pretrain.iterations = 1000
    cfg.mcmc.tstep = 0.05          # all-electron: tighter steps
    cfg.mcmc.steps = 10
    cfg.mcmc.burn_in = 200
    cfg.log.save_path = save_path
    cfg.log.save_frequency = 10.0
    cfg.debug.deterministic = True
    cfg.debug.seed = 31

result = train_lib.train(cfg)
tail = result.energies[-max(1, iterations // 5):]
print("FINAL tail mean %.5f +- %.5f Ha over %d iters"
      % (tail.mean(), tail.std() / np.sqrt(len(tail)), len(tail)))
print("ckpt:", result.ckpt_save_path)
