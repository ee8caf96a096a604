"""Diatomic molecules (pattern: ref ferminet/configs/diatomic.py; covers the
reference's H2 and C2 examples, ref example/C2_muti_GPU/C2test.py)."""

from __future__ import annotations

from aiqmc_tpu import config as config_lib
from aiqmc_tpu.utils import system


def get_config(symbol1: str = "H", symbol2: str = "H",
               bond_length: float = 1.4, units: str = "bohr",
               charge: int = 0, spin_polarisation: int = None):
    cfg = config_lib.default()
    a1 = system.Atom(symbol1, (0.0, 0.0, -bond_length / 2), units=units)
    a2 = system.Atom(symbol2, (0.0, 0.0, bond_length / 2), units=units)
    spins = system.spin_config([a1, a2], charge=charge,
                               spin_polarisation=spin_polarisation)
    pos, charges = system.molecule_arrays([a1, a2])
    with cfg.unlocked():
        cfg.system.atoms = pos
        cfg.system.charges = charges
        cfg.system.spins = spins
    return cfg


def h2(bond_length: float = 1.4):
    return get_config("H", "H", bond_length)


def n2(bond_length: float = 2.068):
    return get_config("N", "N", bond_length)


def c2(bond_length: float = 2.348):
    return get_config("C", "C", bond_length)
