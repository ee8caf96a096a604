"""Periodic diamond-structure carbon (BASELINE.json config #5): PBC
wavefunction + Ewald summation under VMC."""

from __future__ import annotations

import numpy as np

from aiqmc_tpu import config as config_lib


def get_config(lattice_constant: float = 6.74):
    """Conventional 2-atom primitive diamond cell of carbon (a in bohr)."""
    a = lattice_constant
    lattice = np.array([[0.0, a / 2, a / 2],
                        [a / 2, 0.0, a / 2],
                        [a / 2, a / 2, 0.0]])
    atoms = np.array([[0.0, 0.0, 0.0],
                      [a / 4, a / 4, a / 4]])
    charges = np.array([6.0, 6.0])
    nelectrons = 12
    spins = np.concatenate([np.ones(6), -np.ones(6)])
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = atoms
        cfg.system.charges = charges
        cfg.system.spins = spins
        cfg.system.structure = lattice
        cfg.system.pbc = True
        cfg.system.ewald = {"truncation_limit": 5, "heg": False}
    return cfg
