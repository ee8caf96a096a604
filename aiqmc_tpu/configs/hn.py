"""1D hydrogen chain (pattern: ref ferminet/configs/hn.py: natoms H atoms
spaced bond_length apart along x, centred on the origin)."""

from __future__ import annotations

import numpy as np

from aiqmc_tpu import config as config_lib
from aiqmc_tpu.utils import system


def get_config(natoms: int = 2, bond_length: float = 1.4):
    start = -(bond_length * (natoms - 1)) / 2
    atoms = [
        system.Atom("H", (start + i * bond_length, 0.0, 0.0))
        for i in range(natoms)
    ]
    pos, charges = system.molecule_arrays(atoms)
    nalpha = natoms // 2
    spins = np.concatenate([np.ones(nalpha), -np.ones(natoms - nalpha)])
    # Match the reference's electron split (nalpha = natoms // 2): for odd
    # chains the extra electron is spin-down there.
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = pos
        cfg.system.charges = charges
        cfg.system.spins = spins
    return cfg
