"""Helium dimer (pattern: ref ferminet/configs/he2.py: He atoms at
(0,0,±1) bohr, electrons (2,2))."""

from __future__ import annotations

from aiqmc_tpu.configs import diatomic


def get_config(bond_length: float = 2.0):
    return diatomic.get_config("He", "He", bond_length)
