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
    atoms_np = np.asarray(atoms)
    charges_np = np.asarray(charges)
    ndim = atoms_np.shape[1]
    spins = jnp.asarray(electrons).reshape(-1)
    nelectrons = spins.shape[0]
    centers = np.concatenate(
        [np.tile(atoms_np[i], int(charges_np[i])) for i in range(len(atoms_np))]
        + [np.zeros(0)]).reshape(-1, ndim)
    key, subkey = jax.random.split(key)
    if centers.shape[0] < nelectrons and structure is not None:
        # Charge-deficient system (e.g. HEG's chargeless background atom):
        # place the unassigned electrons uniformly over the simulation cell.
        extra = nelectrons - centers.shape[0]
        frac = jax.random.uniform(subkey, (batch_size, extra, ndim))
        key, subkey = jax.random.split(key)
        pad = frac @ jnp.asarray(structure)
        base = jnp.concatenate(
            [jnp.tile(jnp.asarray(centers)[None], [batch_size, 1, 1]), pad],
            axis=1).reshape(batch_size, nelectrons * ndim)
    else:
        if centers.shape[0] < nelectrons:
            mean = atoms_np.mean(axis=0, keepdims=True)
            centers = np.concatenate(
                [centers,
                 np.tile(mean, (nelectrons - centers.shape[0], 1))])
        centers = centers[:nelectrons]
        base = jnp.tile(jnp.asarray(centers).reshape(-1)[None], [batch_size, 1])
    positions = base + init_width * jax.random.normal(subkey, shape=base.shape)
    return positions, spins
