"""Stochastic-comb branching, fully on device.

Capability parity with ref ``AIQMCrelease3/DMC/branch.py:10-33`` plus the
walker-resampling step the reference performs HOST-side with ``np.unique`` and
Python loops (ref DMC/main_dmc.py:218-239). Here the comb indices are computed on
the global weight vector and the walker gather ``positions[newinds]`` happens
inside jit; under GSPMD the gather lowers to an ICI all-to-all over the sharded
batch axis — no device->host->device round trip and no respawn hacks (the comb by
construction returns exactly n walkers, so no "killed walker" special case).
"""

from __future__ import annotations

from typing import Tuple

import chex
import jax
import jax.numpy as jnp

from aiqmc_tpu.models.network import AINetData


def branch(data: AINetData, weights: jnp.ndarray, key: chex.PRNGKey
           ) -> Tuple[AINetData, jnp.ndarray, jnp.ndarray]:
    """Resamples walkers proportionally to weight via a stochastic comb.

    Returns (resampled data, reset weights (wtot/n each), comb indices).
    """
    n = weights.shape[0]
    probability = jnp.cumsum(weights)
    wtot = probability[-1]
    base = jax.random.uniform(key) * wtot
    comb = (base + jnp.linspace(0.0, wtot, n, endpoint=False)) % wtot
    newinds = jnp.searchsorted(probability, comb)
    new_positions = data.positions[newinds]
    new_data = AINetData(**(dict(data) | {"positions": new_positions}))
    new_weights = jnp.full_like(weights, wtot / n)
    return new_data, new_weights, newinds
