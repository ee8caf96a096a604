"""C atom with the ccECP pseudopotential — the reference's canonical example
(ref example/single_atom_C/single_atom_C.py:1-46)."""

from __future__ import annotations

import numpy as np

from aiqmc_tpu import config as config_lib

# ccECP tables for carbon (ref single_atom_C.py:13-23, from C.ccECP.nwchem).
RN_LOCAL = np.array([[1.0, 3.0, 2.0]])
LOCAL_COES = np.array([[4.00000, 57.74008, -25.81955]])
LOCAL_EXPS = np.array([[14.43502, 8.39889, 7.38188]])
RN_NON_LOCAL = np.array([[[2.0, 2.0], [2.0, 2.0], [2.0, 2.0]]])
NON_LOCAL_COES = np.array([[[52.13345, 0], [0, 0], [0, 0]]])
NON_LOCAL_EXPS = np.array([[[7.76079, 0], [0, 0], [0, 0]]])


def get_config():
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.array([[0.0, 0.0, 0.0]])
        cfg.system.charges = np.array([4.0])
        cfg.system.spins = np.array([1.0, -1.0, 1.0, -1.0])
        cfg.system.use_pp = True
        cfg.system.pp.list_l = 2
        cfg.system.pp.rn_local = RN_LOCAL
        cfg.system.pp.local_coes = LOCAL_COES
        cfg.system.pp.local_exps = LOCAL_EXPS
        cfg.system.pp.rn_non_local = RN_NON_LOCAL
        cfg.system.pp.non_local_coes = NON_LOCAL_COES
        cfg.system.pp.non_local_exps = NON_LOCAL_EXPS
        cfg.mcmc.tstep = 0.05
    return cfg
