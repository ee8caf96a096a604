"""Methane (pattern: ref ferminet/configs/ch4.py) — KFAC benchmark system
(BASELINE.json config #2)."""

from __future__ import annotations

import numpy as np

from aiqmc_tpu import config as config_lib
from aiqmc_tpu.utils import system


def get_config(bond_length: float = 2.0673):
    d = bond_length / np.sqrt(3.0)
    atoms = [
        system.Atom("C", (0.0, 0.0, 0.0)),
        system.Atom("H", (d, d, d)),
        system.Atom("H", (d, -d, -d)),
        system.Atom("H", (-d, d, -d)),
        system.Atom("H", (-d, -d, d)),
    ]
    pos, charges = system.molecule_arrays(atoms)
    spins = system.spin_config(atoms)
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = pos
        cfg.system.charges = charges
        cfg.system.spins = spins
        cfg.optim.optimizer = "kfac"
    return cfg
