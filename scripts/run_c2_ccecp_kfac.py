"""C2 dimer ccECP VMC with native KFAC — the reference's flagship example,
converged (its committed trace, AIQMCrelease3/example/C2/Save/train_states.csv,
is a 10-step startup transient -12.87 -> -9.47 Ha).

Geometry: EQUILIBRIUM bond 2.348 bohr (the reference example,
ref example/C2_muti_GPU/C2test.py:9, uses atoms at (0,0,+-1) bohr = a
2.0-bohr bond, compressed 0.35 bohr vs physical — we run the physical
geometry so the number is comparable to the ccECP DMC literature
~ -11.06 Ha). Context: 2 isolated ccECP C atoms = -10.868.
Pass a bond length as argv[3] to reproduce the compressed reference cut.

Uses the 12-pt icosahedral nonlocal quadrature (estimator-equivalent to the
50-pt rule, ~4x cheaper at 8 electrons x 2 atoms).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_c2_ccecp_kfac.py [iterations] [save_path]
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import c2_ccecp

iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 9000
save_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/runs/c2_kfac"
bond = float(sys.argv[3]) if len(sys.argv) > 3 else 2.348

cfg = c2_ccecp.get_config(bond_length=bond)
with cfg.unlocked():
    cfg.batch_size = 1024
    cfg.network.hidden_dims = ((128, 32),) * 4
    cfg.network.hidden_dims_ynlm = (16, 16, 16, 16)
    cfg.network.determinants = 8
    cfg.system.pp.quadrature = "icosahedral12"
    cfg.optim.optimizer = "kfac"
    cfg.optim.laplacian = "forward"
    cfg.optim.iterations = iterations
    cfg.optim.kfac.lr.rate = 0.05
    cfg.optim.kfac.lr.delay = 3000.0
    cfg.optim.ema_decay = 0.999   # Polyak params; run_c2_ccecp_dmc auto-uses
    cfg.pretrain.iterations = 1000
    cfg.mcmc.tstep = 0.25
    cfg.mcmc.steps = 10
    cfg.mcmc.burn_in = 200
    cfg.log.save_path = save_path
    cfg.log.save_frequency = 10.0
    cfg.debug.deterministic = True
    cfg.debug.seed = 41

result = train_lib.train(cfg)
tail = result.energies[-max(1, iterations // 5):]
print("FINAL tail mean %.5f +- %.5f Ha over %d iters"
      % (tail.mean(), tail.std() / np.sqrt(len(tail)), len(tail)))
print("ckpt:", result.ckpt_save_path)
