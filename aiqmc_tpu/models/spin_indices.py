"""Static spin-configuration index arrays.

Capability parity with ref ``AIQMCrelease3/spin_indices.py:5-46``: given a fixed
spin pattern (e.g. [1,-1,1,-1,...]) produce the (i,j) pair indices of parallel /
antiparallel electron pairs (for the Pade e-e Jastrow) and the per-channel electron
indices used to reorder the one-electron stream before the orbital projection.

Everything here is host-side NumPy executed once at network-construction time —
these are *static* shape-defining quantities, so keeping them out of traced code is
required for XLA (no data-dependent shapes inside jit).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def jastrow_indices_ee(spins, nelectrons: int) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Returns (parallel_indices, antiparallel_indices, n_parallel, n_antiparallel).

    Index arrays have shape (2, npairs): row 0 = i, row 1 = j with i<j, matching the
    reference layout consumed by its Jastrow vmap (ref spin_indices.py:5-19).
    """
    spins = np.asarray(spins).reshape(-1)[:nelectrons]
    outer = spins[:, None] * spins[None, :]
    iu, ju = np.triu_indices(nelectrons, k=1)
    pair_sign = outer[iu, ju]
    par = pair_sign > 0
    anti = pair_sign < 0
    parallel_indices = np.stack([iu[par], ju[par]], axis=0)
    antiparallel_indices = np.stack([iu[anti], ju[anti]], axis=0)
    return (parallel_indices, antiparallel_indices,
            parallel_indices.shape[1], antiparallel_indices.shape[1])


def jastrow_indices_ae(charges_jastrow, natoms: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-electron atom index / charge arrays (ref spin_indices.py:22-35)."""
    charges = np.asarray(charges_jastrow)
    atom_indices = np.concatenate(
        [np.repeat(i, int(charges[i])) for i in range(natoms)])
    charges_needed = np.concatenate(
        [np.repeat(charges[i], int(charges[i])) for i in range(natoms)])
    return atom_indices, charges_needed


def spin_indices_h(spins) -> Tuple[np.ndarray, np.ndarray]:
    """Indices of spin-up / spin-down electrons (ref spin_indices.py:38-46)."""
    spins = np.asarray(spins).reshape(-1)
    up = np.nonzero(spins > 0)[0]
    down = np.nonzero(spins < 0)[0]
    return up, down
