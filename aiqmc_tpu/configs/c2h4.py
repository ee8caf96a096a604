"""Ethene (pattern: ref ferminet/configs/c2h4.py; geometry in bohr)."""

from __future__ import annotations

from aiqmc_tpu import config as config_lib
from aiqmc_tpu.utils import system


def get_config():
    atoms = [
        system.Atom("C", (0.0, 0.0, 1.26135)),
        system.Atom("C", (0.0, 0.0, -1.26135)),
        system.Atom("H", (0.0, 1.74390, 2.33889)),
        system.Atom("H", (0.0, -1.74390, 2.33889)),
        system.Atom("H", (0.0, 1.74390, -2.33889)),
        system.Atom("H", (0.0, -1.74390, -2.33889)),
    ]
    pos, charges = system.molecule_arrays(atoms)
    spins = system.spin_config(atoms, spin_polarisation=0)
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = pos
        cfg.system.charges = charges
        cfg.system.spins = spins
    return cfg
