"""Quality run v2: C atom ccECP VMC, native KFAC, ECP-RHF pretraining.

Upgrades over scripts/run_c_ccecp_kfac.py (which reached -5.2479 Ha after an
interrupted 3522 iterations, still above UHF -5.3324):
  - valence ECP-RHF orbital pretraining (validated in tests/test_ecp_scf.py)
  - wider network ((128,32)x4, 8 determinants)
  - KFAC LR schedule that actually decays within the run (delay 3000)
ccECP references for C: UHF -5.3324 Ha, exact/DMC -5.434 Ha.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_c_ccecp_kfac2.py [iterations] [save_path]
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import c_atom_ccecp

iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
save_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/runs/c_kfac2"

cfg = c_atom_ccecp.get_config()
with cfg.unlocked():
    # Triplet 3P ground state: (3 up, 1 down) valence electrons.
    cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
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
    cfg.mcmc.tstep = 0.25          # valence-only: pmove ~0.5-0.6
    cfg.mcmc.steps = 10
    cfg.mcmc.burn_in = 200
    cfg.log.save_path = save_path
    cfg.log.save_frequency = 10.0
    cfg.debug.deterministic = True
    cfg.debug.seed = 29

result = train_lib.train(cfg)
tail = result.energies[-max(1, iterations // 5):]
print("FINAL tail mean %.5f +- %.5f Ha over %d iters"
      % (tail.mean(), tail.std() / np.sqrt(len(tail)), len(tail)))
print("ckpt:", result.ckpt_save_path)
