"""Wrap electron positions into the primitive cell.

Capability parity with ref ``AIQMCrelease3/PBC/enforcePBC.py:23-45``; one fused
matmul + mod instead of nested vmaps.
"""

from __future__ import annotations

import jax.numpy as jnp


def enforce_pbc(lattice: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Maps (..., nelec*3) positions into the cell spanned by lattice rows."""
    shape = pos.shape
    x = pos.reshape(shape[:-1] + (-1, 3))
    frac = x @ jnp.linalg.inv(lattice)
    frac = jnp.mod(frac, 1.0)
    return (frac @ lattice).reshape(shape)


def minimum_image(lattice: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """Maps displacement vectors (..., 3) to their minimum-image equivalents."""
    frac = disp @ jnp.linalg.inv(lattice)
    frac = frac - jnp.round(frac)
    return frac @ lattice
