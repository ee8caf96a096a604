"""Four hydrogen atoms on a circle (pattern: ref ferminet/configs/h4.py:
angle/radius parameterisation in angstrom, one H per quadrant)."""

from __future__ import annotations

import itertools

import numpy as np

from aiqmc_tpu import config as config_lib
from aiqmc_tpu.utils import system


def get_config(angle: float = 90.0, radius: float = 1.738):
    t = np.radians(angle / 2)
    x = radius * np.cos(t)
    y = radius * np.sin(t)
    atoms = [
        system.Atom("H", (i * x, j * y, 0.0), units="angstrom")
        for i, j in itertools.product((1, -1), (1, -1))
    ]
    pos, charges = system.molecule_arrays(atoms)
    spins = system.spin_config(atoms, spin_polarisation=0)
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = pos
        cfg.system.charges = charges
        cfg.system.spins = spins
    return cfg
