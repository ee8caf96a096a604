"""Quality run: C atom ccECP VMC with native KFAC (BASELINE config #3 class).

ROADMAP recipe: triplet (3,1) ground state, 4 determinants, wider h-stream,
KFAC, long run, tstep tuned. ccECP references: UHF -5.3324 Ha, DMC -5.434 Ha.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache PYTHONPATH=/root/repo \
         python -u scripts/run_c_ccecp_kfac.py [iterations] [save_path]
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import c_atom_ccecp

iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
save_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/c_ccecp_kfac"

cfg = c_atom_ccecp.get_config()
with cfg.unlocked():
    # Triplet 3P ground state: (3 up, 1 down) valence electrons.
    cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
    cfg.batch_size = 2048
    cfg.network.hidden_dims = ((64, 16), (64, 16), (64, 16))
    cfg.network.hidden_dims_ynlm = (16, 16, 16)
    cfg.network.determinants = 4
    cfg.optim.optimizer = "kfac"
    cfg.optim.laplacian = "forward"
    cfg.optim.iterations = iterations
    cfg.mcmc.tstep = 0.25          # valence-only: tuned toward pmove ~0.5-0.6
    cfg.mcmc.steps = 10
    cfg.mcmc.burn_in = 200
    cfg.log.save_path = save_path
    cfg.log.save_frequency = 10.0
    cfg.debug.deterministic = True
    cfg.debug.seed = 23

result = train_lib.train(cfg)
tail = result.energies[-max(1, iterations // 10):]
print("FINAL tail mean %.5f +- %.5f Ha over %d iters"
      % (tail.mean(), tail.std() / np.sqrt(len(tail)), len(tail)))
print("ckpt:", result.ckpt_save_path)
