"""DMC branching-weight exponent S (ref AIQMCrelease3/DMC/S_matrix.py:4-24).

S = E_trial - E_est + clamp(E_est - E_L, branchcut) / (1 + (v^2 tau / nelec)^2)

Vectorised over the walker batch (the reference's jnp.min collapses the batch
through a 2-element stack; here the clamp is elementwise per walker).
"""

from __future__ import annotations

import jax.numpy as jnp


def comput_S(e_trial, e_est, branchcut, v2, tau: float, eloc, nelec: int):
    """Returns S per walker.

    Args:
      e_trial/e_est: scalars (possibly complex; real parts used).
      branchcut: scalar or per-walker cutoff (already scaled by sigma_E).
      v2: (batch, 3N) squared limited drift components.
      tau: time step.
      eloc: (batch,) local energies.
      nelec: number of electrons.
    """
    v2 = jnp.sum(v2, axis=-1)
    eloc = jnp.real(eloc)
    e_est = jnp.real(e_est)
    e_trial = jnp.real(e_trial)
    e_cut = e_est - eloc
    e_cut = jnp.minimum(jnp.abs(e_cut), branchcut) * jnp.sign(e_cut)
    denominator = 1.0 + (v2 * tau / nelec) ** 2
    return e_trial - e_est + e_cut / denominator
