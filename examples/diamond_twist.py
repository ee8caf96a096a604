"""Periodic example: valence ccECP diamond (2-atom primitive cell) at a
twist, trained with KFAC on the TPU-safe complex-pairs representation, then
fixed-phase DMC from the trained trial.

Combines capabilities the reference only sketches (its PBC set is
all-electron WIP, ref AIQMCrelease3/PBC/*; its DMC is real molecular, ref
DMC/main_dmc.py): Ewald(Z_eff) + minimum-image ccECP channels
(hamiltonian/pp_pbc.py), twisted boundary conditions (pbc/twist.py), and
Re-E_L fixed-phase DMC branching (dmc/propagate.py).

Production-sized variants: scripts/run_diamond_ccecp.py (VMC per twist),
scripts/eval_tabc.py + analysis_tools.tabc_average (twist averaging),
scripts/run_diamond_dmc.py (DMC).
"""
import numpy as np

from aiqmc_tpu import train
from aiqmc_tpu.configs import diamond_ccecp

TWIST = (0.25, 0.25, 0.25)   # fractional reciprocal coordinates

cfg = diamond_ccecp.get_config()
with cfg.unlocked():
    cfg.batch_size = 512
    cfg.network.hidden_dims = ((64, 16),) * 3
    cfg.network.hidden_dims_ynlm = (16, 16, 16)
    cfg.network.determinants = 4
    cfg.network.complex_orbitals = True
    cfg.network.complex_pairs = True     # no complex dtype -> runs on TPU
    cfg.system.twist = TWIST
    cfg.optim.optimizer = "kfac"
    cfg.optim.iterations = 2000
    cfg.mcmc.burn_in = 200
    cfg.log.save_path = "diamond_twist_example"

result = train.train(cfg)
tail = result.energies[-400:]
print("VMC tail %.4f +- %.4f Ha/cell at twist %s"
      % (tail.mean(), tail.std() / np.sqrt(len(tail)), (TWIST,)))
print("DMC follow-up: python scripts/run_diamond_dmc.py "
      "diamond_twist_example %g %g %g" % TWIST)
