"""Atom/system definition helpers and unit conversion.

Capability parity with ref ``ferminet/utils/system.py:27-116`` (Atom dataclass
with unit conversion) and ``ferminet/utils/units.py:34-47``.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import numpy as np

from aiqmc_tpu.utils import elements

BOHR_PER_ANGSTROM = 1.8897259886
HARTREE_PER_EV = 1.0 / 27.211386245988


def angstrom2bohr(x):
    return x * BOHR_PER_ANGSTROM


def bohr2angstrom(x):
    return x / BOHR_PER_ANGSTROM


def ev2hartree(x):
    return x * HARTREE_PER_EV


def hartree2ev(x):
    return x / HARTREE_PER_EV


@dataclasses.dataclass
class Atom:
    """An atom with symbol, coordinates and (optionally overridden) charge."""
    symbol: str
    coords: Sequence[float] = (0.0, 0.0, 0.0)
    units: str = "bohr"
    charge: float = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.charge is None:
            self.charge = float(elements.SYMBOLS[self.symbol].atomic_number)
        if self.units not in ("bohr", "angstrom"):
            raise ValueError(f"Unknown units: {self.units}")
        if self.units == "angstrom":
            self.coords = [angstrom2bohr(x) for x in self.coords]
            self.units = "bohr"

    @property
    def coords_array(self) -> np.ndarray:
        return np.asarray(self.coords, dtype=np.float64)

    @property
    def element(self):
        return elements.SYMBOLS[self.symbol]


def molecule_arrays(atoms: Sequence[Atom]) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (positions (natoms, 3), charges (natoms,)) arrays."""
    pos = np.stack([a.coords_array for a in atoms])
    charges = np.asarray([a.charge for a in atoms])
    return pos, charges


def spin_config(atoms: Sequence[Atom], charge: int = 0,
                spin_polarisation: int = None) -> np.ndarray:
    """Default spin configuration array [+1, ..., -1, ...] for a molecule.

    spin_polarisation: n_up - n_down; default = nelectrons % 2.
    """
    nelectrons = int(sum(a.charge for a in atoms)) - charge
    if spin_polarisation is None:
        spin_polarisation = nelectrons % 2
    n_up = (nelectrons + spin_polarisation) // 2
    n_down = nelectrons - n_up
    return np.concatenate([np.ones(n_up), -np.ones(n_down)])
