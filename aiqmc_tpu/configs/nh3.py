"""Ammonia (pattern: ref ferminet/configs/nh3.py; geometry in bohr)."""

from __future__ import annotations

from aiqmc_tpu import config as config_lib
from aiqmc_tpu.utils import system


def get_config():
    atoms = [
        system.Atom("N", (0.0, 0.0, 0.22013)),
        system.Atom("H", (0.0, 1.77583, -0.51364)),
        system.Atom("H", (1.53791, -0.88791, -0.51364)),
        system.Atom("H", (-1.53791, -0.88791, -0.51364)),
    ]
    pos, charges = system.molecule_arrays(atoms)
    spins = system.spin_config(atoms, spin_polarisation=0)
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = pos
        cfg.system.charges = charges
        cfg.system.spins = spins
    return cfg
