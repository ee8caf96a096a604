"""Periodic table data (capability parity with ref ferminet/utils/elements.py).

Atomic numbers and ground-state spin polarisations (2S = n_up - n_down from
Hund's rules) for elements H-Kr, which covers the reference's systems (H, C, N,
O, Si, Ge plus the upstream configs).
"""

from __future__ import annotations

import dataclasses
from typing import Dict


@dataclasses.dataclass(frozen=True)
class Element:
    symbol: str
    atomic_number: int
    spin_polarisation: int  # n_up - n_down in the ground state


_ELEMENTS = [
    ("H", 1, 1), ("He", 2, 0),
    ("Li", 3, 1), ("Be", 4, 0), ("B", 5, 1), ("C", 6, 2), ("N", 7, 3),
    ("O", 8, 2), ("F", 9, 1), ("Ne", 10, 0),
    ("Na", 11, 1), ("Mg", 12, 0), ("Al", 13, 1), ("Si", 14, 2), ("P", 15, 3),
    ("S", 16, 2), ("Cl", 17, 1), ("Ar", 18, 0),
    ("K", 19, 1), ("Ca", 20, 0), ("Sc", 21, 1), ("Ti", 22, 2), ("V", 23, 3),
    ("Cr", 24, 6), ("Mn", 25, 5), ("Fe", 26, 4), ("Co", 27, 3), ("Ni", 28, 2),
    ("Cu", 29, 1), ("Zn", 30, 0), ("Ga", 31, 1), ("Ge", 32, 2), ("As", 33, 3),
    ("Se", 34, 2), ("Br", 35, 1), ("Kr", 36, 0),
]

SYMBOLS: Dict[str, Element] = {
    s: Element(s, z, sp) for (s, z, sp) in _ELEMENTS
}
ATOMIC_NUMS: Dict[int, Element] = {e.atomic_number: e for e in SYMBOLS.values()}
