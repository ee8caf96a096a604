"""PsiFormer example: the attention ansatz (von Glehn et al. 2022; ref
ferminet/psiformer.py capability) on the carbon atom with the ccECP
pseudopotential, native KFAC, and the one-pass forward Laplacian.

Production-sized variant: scripts/run_c_ccecp_psiformer.py.
"""
import numpy as np

from aiqmc_tpu import train
from aiqmc_tpu.configs import c_atom_ccecp

cfg = c_atom_ccecp.get_config()
with cfg.unlocked():
    cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])  # 3P ground term
    cfg.batch_size = 1024
    cfg.network.network_type = "psiformer"
    cfg.network.psiformer.num_layers = 2
    cfg.network.psiformer.num_heads = 4
    cfg.network.psiformer.heads_dim = 16
    cfg.network.psiformer.mlp_hidden_dims = (128,)
    cfg.network.determinants = 8
    cfg.optim.optimizer = "kfac"
    cfg.optim.laplacian = "forward"
    cfg.system.pp.quadrature = "icosahedral12"
    cfg.optim.iterations = 2000
    cfg.pretrain.iterations = 500
    cfg.mcmc.burn_in = 200
    cfg.log.save_path = "psiformer_c_example"

result = train.train(cfg)
tail = result.energies[-400:]
print("VMC tail %.4f +- %.4f Ha (exact valence -5.434)"
      % (tail.mean(), tail.std() / np.sqrt(len(tail))))
