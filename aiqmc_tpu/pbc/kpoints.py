"""k-point grids for supercell calculations.

Capability parity with ref ``AIQMCrelease3/PBC/PBCenvelope.py:22-43``
(homogeneous Monkhorst-Pack-style grid from a primitive cell + supercell
matrix) and the upstream Bloch-phase envelope
(ref ferminet/pbc/envelopes.py:31-77), written TPU-safe (cos/sin pairs instead
of complex exponentials).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def make_kpoints(lattice, supercell) -> jnp.ndarray:
    """Fractional k-points of the supercell commensurate with the primitive cell.

    Args:
      lattice: (3, 3) rows = primitive lattice vectors.
      supercell: (3, 3) integer matrix S; supercell vectors are S @ lattice.

    Returns: (nk, 3) fractional k-points in the primitive reciprocal basis.
    """
    supercell = np.asarray(supercell)
    mesh = np.abs(np.diag(supercell)).astype(int)
    mesh = np.maximum(mesh, 1)
    grid = np.stack(np.meshgrid(*[np.arange(m) for m in mesh],
                                indexing="ij"), -1).reshape(-1, 3)
    return jnp.asarray(grid / mesh)


def make_envelope_kpoints(lattice, nelectrons: int,
                          min_kpoints: int = None) -> jnp.ndarray:
    """Cartesian reciprocal vectors for the multiwave envelope, lowest filled
    shell covering >= nelectrons points (ref ferminet/pbc/envelopes.py:79-122,
    adapted to our rows-are-lattice-vectors convention).
    """
    import itertools

    lattice = np.asarray(lattice)
    # Rows of rec are the reciprocal basis vectors b_j (a_i . b_j = 2 pi d_ij).
    rec = 2 * np.pi * np.linalg.inv(lattice).T
    if min_kpoints is None:
        min_kpoints = nelectrons
    elif min_kpoints < nelectrons:
        raise ValueError("min_kpoints must cover all electrons")
    dk = 1 + 1e-5
    max_k = int(np.ceil(min_kpoints * dk) ** (1 / 3.0))
    ordinals = sorted(range(-max_k, max_k + 1), key=abs)
    ordinals = np.asarray(list(itertools.product(ordinals, repeat=3)))
    kpoints = ordinals @ rec
    kpoints = kpoints[np.argsort(np.linalg.norm(kpoints, axis=1))]
    k_norms = np.linalg.norm(kpoints, axis=1)
    return jnp.asarray(kpoints[k_norms <= k_norms[min_kpoints - 1] * dk])


def bloch_phases(kpoints_frac: jnp.ndarray, lattice,
                 pos: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cos, sin) of k . r for each (electron, k) pair — TPU-safe Bloch factors.

    kpoints_frac: (nk, 3) fractional; lattice rows = primitive vectors;
    pos: (nelec, 3) Cartesian. Returns two (nelec, nk) arrays.
    """
    rec = 2 * jnp.pi * jnp.linalg.inv(jnp.asarray(lattice)).T  # rows
    k_cart = kpoints_frac @ rec
    phase = pos @ k_cart.T
    return jnp.cos(phase), jnp.sin(phase)
