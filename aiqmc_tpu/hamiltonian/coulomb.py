"""Coulomb potential terms (ref AIQMCrelease3/Energy/hamiltonian.py:177-233)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def potential_electron_electron(r_ee: jnp.ndarray) -> jnp.ndarray:
    """Sum over unordered pairs of 1/r_ij. r_ee: (nelec, nelec, 1)."""
    r = r_ee[..., 0]
    n = r.shape[0]
    iu, ju = np.triu_indices(n, k=1)
    return jnp.sum(1.0 / r[iu, ju])


def potential_electron_nuclear(charges: jnp.ndarray, r_ae: jnp.ndarray) -> jnp.ndarray:
    """-sum_{i,a} Z_a / r_ia. r_ae: (nelec, natoms, 1)."""
    return -jnp.sum(charges / r_ae[..., 0])


def potential_nuclear_nuclear(charges: jnp.ndarray, atoms: jnp.ndarray) -> jnp.ndarray:
    """Sum over nucleus pairs of Z_a Z_b / r_ab.

    Gathers the strict upper-triangle pairs BEFORE the norm/division: masking
    the zero diagonal after dividing leaves inf/NaN partials that reverse-mode
    AD propagates as 0 * NaN = NaN (the force estimator, forces.py,
    differentiates this term with respect to ``atoms``).
    """
    n = atoms.shape[0]
    if n < 2:
        return jnp.zeros((), dtype=atoms.dtype)
    iu, ju = np.triu_indices(n, k=1)
    r = jnp.linalg.norm(atoms[iu] - atoms[ju], axis=-1)
    return jnp.sum(charges[iu] * charges[ju] / r)


def potential_energy(r_ae: jnp.ndarray, r_ee: jnp.ndarray, atoms: jnp.ndarray,
                     charges: jnp.ndarray) -> jnp.ndarray:
    """Full Coulomb potential of a molecular configuration."""
    return (potential_electron_electron(r_ee) +
            potential_electron_nuclear(charges, r_ae) +
            potential_nuclear_nuclear(charges, atoms))
