"""Single-atom configuration (pattern: ref ferminet/configs/atom.py:23-63)."""

from __future__ import annotations

import numpy as np

from aiqmc_tpu import config as config_lib
from aiqmc_tpu.utils import elements, system


def get_config(symbol: str = "C", charge: int = 0,
               spin_polarisation: int = None):
    cfg = config_lib.default()
    atom = system.Atom(symbol)
    element = elements.SYMBOLS[symbol]
    if spin_polarisation is None:
        spin_polarisation = element.spin_polarisation
    nelectrons = element.atomic_number - charge
    n_up = (nelectrons + spin_polarisation) // 2
    spins = np.concatenate([np.ones(n_up), -np.ones(nelectrons - n_up)])
    with cfg.unlocked():
        cfg.system.atoms = np.zeros((1, 3))
        cfg.system.charges = np.array([float(element.atomic_number)])
        cfg.system.spins = spins
    return cfg
