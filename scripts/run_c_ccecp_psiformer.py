"""Round-3 arm D: PsiFormer flagship on C ccECP.

The FermiNet-class flagship plateaus ~10 mHa above published VMC (-5.4254) and
continuation cannot close it (BASELINE.md 67k-iteration row).  The PsiFormer
ansatz (von Glehn et al. 2022; ref ferminet/psiformer.py) reaches lower
fixed-node energies than FermiNet at matched budgets on first-row atoms, so a
fresh attention-ansatz run attacks the gap at the ansatz level rather than the
schedule level.  Sized near the published "small" PsiFormer (L=4 attention
blocks, d_model 128, 16 determinants); the C valence system is tiny (4 e-), so
attention is cheap and batch 4096 keeps the chip busy.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/run_c_ccecp_psiformer.py [iterations] [save_path] [restore_path]
"""
import sys

import numpy as np

from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import c_atom_ccecp

iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
save_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/runs/c_psiformer"
restore_path = sys.argv[3] if len(sys.argv) > 3 else ""

cfg = c_atom_ccecp.get_config()
with cfg.unlocked():
    cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
    cfg.batch_size = 4096
    cfg.network.network_type = "psiformer"
    cfg.network.psiformer.num_layers = 4
    cfg.network.psiformer.num_heads = 4
    cfg.network.psiformer.heads_dim = 32
    cfg.network.psiformer.mlp_hidden_dims = (256,)
    cfg.network.determinants = 16
    cfg.optim.optimizer = "kfac"
    cfg.optim.laplacian = "forward"
    cfg.system.pp.quadrature = "icosahedral12"
    cfg.optim.iterations = iterations
    cfg.optim.kfac.lr.rate = 0.05
    cfg.optim.kfac.lr.delay = 10000.0   # upstream-FermiNet schedule
    cfg.optim.ema_decay = 0.999
    cfg.pretrain.iterations = 1000
    cfg.mcmc.tstep = 0.25
    cfg.mcmc.steps = 10
    cfg.mcmc.burn_in = 200
    cfg.log.save_path = save_path
    if restore_path:
        cfg.log.restore_path = restore_path
    cfg.log.save_frequency = 10.0
    cfg.debug.deterministic = True
    cfg.debug.seed = 37

result = train_lib.train(cfg)
tail = result.energies[-max(1, iterations // 5):]
print("FINAL tail mean %.5f +- %.5f Ha over %d iters (psiformer arm)"
      % (tail.mean(), tail.std() / np.sqrt(len(tail)), len(tail)))
print("ckpt:", result.ckpt_save_path)
