"""Initial walker configurations.

Parity with ref ``AIQMCrelease3/initial_electrons_positions/init.py:7-31``: tile
each atom position once per unit of nuclear charge and add atom-centred Gaussian
noise. Vectorised (the reference builds the batch in a Python loop over walkers).
"""

from __future__ import annotations

from typing import Tuple

import chex
import jax
import jax.numpy as jnp
import numpy as np


def init_electrons(key: chex.PRNGKey,
                   structure: jnp.ndarray,
                   atoms: jnp.ndarray,
                   charges: jnp.ndarray,
                   electrons: jnp.ndarray,
                   batch_size: int,
                   init_width: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ((batch, nelectrons*ndim) positions, (nelectrons,) spins)."""
    del structure  # kept for API parity; open-boundary init ignores the cell
    atoms_np = np.asarray(atoms)
    charges_np = np.asarray(charges)
    ndim = atoms_np.shape[1]
    centers = np.concatenate(
        [np.tile(atoms_np[i], int(charges_np[i])) for i in range(len(atoms_np))])
    base = jnp.tile(jnp.asarray(centers)[None, :], [batch_size, 1])
    key, subkey = jax.random.split(key)
    positions = base + init_width * jax.random.normal(subkey, shape=base.shape)
    nelectrons = centers.size // ndim
    spins = jnp.asarray(electrons).reshape(-1)[:nelectrons]
    return positions, spins
