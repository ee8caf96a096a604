"""Valence-only periodic diamond carbon: 2-atom primitive cell with the ccECP
on both atoms (8 valence electrons) — the physically comparable variant of
BASELINE config #5 (the round-1 all-electron 2-atom cell carries a ~-4 Ha
electron-image model-Hamiltonian offset; removing the cores shrinks both the
finite-size offset and the variance).

Ewald bookkeeping validated against the exact NaCl Madelung constant
(tests/test_pbc.py); the pp+PBC composition is validated by the large-cell
molecular limit and translation invariance (tests/test_pp_pbc.py). Supports
twist-averaged boundary conditions via cfg.system.twist (pbc/twist.py).
"""

from __future__ import annotations

import numpy as np

from aiqmc_tpu import config as config_lib
from aiqmc_tpu.configs import c_atom_ccecp as cc


def get_config(lattice_constant: float = 6.74):
    """Conventional 2-atom primitive diamond cell, C ccECP (a in bohr)."""
    a = lattice_constant
    lattice = np.array([[0.0, a / 2, a / 2],
                        [a / 2, 0.0, a / 2],
                        [a / 2, a / 2, 0.0]])
    atoms = np.array([[0.0, 0.0, 0.0],
                      [a / 4, a / 4, a / 4]])
    z_eff = np.array([4.0, 4.0])          # He-core ccECP: 4 valence each
    nelectrons = 8
    spins = np.concatenate([np.ones(4), -np.ones(4)])
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = atoms
        cfg.system.charges = z_eff
        cfg.system.spins = spins
        cfg.system.structure = lattice
        cfg.system.pbc = True
        cfg.system.use_pp = True
        cfg.system.pp.list_l = 2
        # Per-atom ccECP tables (both carbons share the C tables).
        cfg.system.pp.rn_local = np.tile(cc.RN_LOCAL, (2, 1))
        cfg.system.pp.local_coes = np.tile(cc.LOCAL_COES, (2, 1))
        cfg.system.pp.local_exps = np.tile(cc.LOCAL_EXPS, (2, 1))
        cfg.system.pp.rn_non_local = np.tile(cc.RN_NON_LOCAL, (2, 1, 1))
        cfg.system.pp.non_local_coes = np.tile(cc.NON_LOCAL_COES, (2, 1, 1))
        cfg.system.pp.non_local_exps = np.tile(cc.NON_LOCAL_EXPS, (2, 1, 1))
        cfg.system.pp.quadrature = "icosahedral12"
        cfg.system.ewald = {"truncation_limit": 5, "heg": False}
        cfg.mcmc.tstep = 0.25
    return cfg
