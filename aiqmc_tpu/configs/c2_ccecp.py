"""C2 molecule with the ccECP pseudopotential — the reference's flagship
multi-GPU example (ref example/C2_muti_GPU/C2test.py:1-55: atoms at
(0,0,±1) bohr, charges 4.0, spins (4,4), the single-atom C tables tiled to
both atoms)."""

from __future__ import annotations

import numpy as np

from aiqmc_tpu import config as config_lib
from aiqmc_tpu.configs import c_atom_ccecp as c


def get_config(bond_length: float = 2.0):
    cfg = config_lib.default()
    h = bond_length / 2.0
    with cfg.unlocked():
        cfg.system.atoms = np.array([[0.0, 0.0, -h], [0.0, 0.0, h]])
        cfg.system.charges = np.array([4.0, 4.0])
        cfg.system.spins = np.array([1.0] * 4 + [-1.0] * 4)
        cfg.system.use_pp = True
        cfg.system.pp.list_l = 2
        cfg.system.pp.rn_local = np.tile(c.RN_LOCAL, (2, 1))
        cfg.system.pp.local_coes = np.tile(c.LOCAL_COES, (2, 1))
        cfg.system.pp.local_exps = np.tile(c.LOCAL_EXPS, (2, 1))
        cfg.system.pp.rn_non_local = np.tile(c.RN_NON_LOCAL, (2, 1, 1))
        cfg.system.pp.non_local_coes = np.tile(c.NON_LOCAL_COES, (2, 1, 1))
        cfg.system.pp.non_local_exps = np.tile(c.NON_LOCAL_EXPS, (2, 1, 1))
        cfg.mcmc.tstep = 0.25
    return cfg
