"""Multiplicative envelopes.

Parity with ref ``AIQMCrelease3/wavefunction_Ynlm/envelope.py`` ("flexible Gaussian
basis" / pseudopotential-like envelope):

    env_i = sum_a alpha * exp(-beta_a * r_ia^2)
          + sum_{a,d} sigma_{a,d} * xi * exp(-ae_{i,a,d} * pi_{a,d})

The reference stores one parameter dict per electron in a Python list and applies
the envelope in a per-electron Python loop (ref nn.py:479-484), which unrolls into
nelectrons separate kernels. Here the parameters are stacked into arrays with a
leading electron (or orbital) axis and the application is one fused broadcast —
a single VPU kernel regardless of system size.

Two modes:
  * ``per_electron=True`` (reference-faithful): parameters indexed by electron;
    the scalar envelope multiplies row i of the determinant matrix. Like the
    reference, this breaks exact antisymmetry under same-spin exchange.
  * ``per_electron=False``: parameters indexed by *orbital* (column); the envelope
    value env(x_i; theta_j) multiplies matrix element (i, j), which commutes with
    electron permutations — the FermiNet PRE_DETERMINANT arrangement
    (ferminet/envelopes.py:29), restoring exact antisymmetry.

The reference also initialises dead parameters (eplion, mu, nu — ref
envelope.py:20-22) that its apply never reads; we omit them.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp


def make_pp_like_envelope(per_electron: bool = True, bounded: bool = False):
    """Returns (init, apply) for the flexible-Gaussian envelope.

    ``bounded=True`` replaces the reference's anisotropic term
    sum_d sigma_d exp(-ae_d * pi_d), which is doubly pathological — each
    exponential GROWS for negative displacements, and even with decaying
    per-component factors a SUM over components stays O(1) along every
    coordinate plane (measured: log|psi| flat from r=5 to 50 at init), so
    |psi|^2 is never normalisable — by the decaying-everywhere SMOOTH form

        sigma_bar * exp(-sum_d softplus(pi_d) * (sqrt(1 + ae_d^2) - 1))

    per atom (component sum inside the exponential), plus softplus(beta) in the
    Gaussian channel. Smoothness matters too: |x|-type kinks on the coordinate
    planes add surface kinetic terms invisible to the log-derivative local
    energy (observed as a variational violation on He); sqrt(1+x^2)-1 is
    smooth, 0 at the nucleus and ~|x| at large distance.
    """

    def init(natom: int, nelectrons: int, ndim: int = 3) -> Mapping[str, jnp.ndarray]:
        n = nelectrons  # one parameter set per electron (or per orbital).
        return {
            "pi": jnp.ones(shape=(n, natom, ndim)),
            "sigma": jnp.ones(shape=(n, natom, ndim)),
            "alpha": jnp.ones(shape=(n, 1)),
            "beta": jnp.ones(shape=(n, natom)),
            "xi": jnp.ones(shape=(n, 1)),
        }

    def _decay_beta(beta):
        return jax.nn.softplus(beta) if bounded else beta

    def _aniso(ae, pi, sigma):
        """Anisotropic channel, summed over dims and atoms.

        ae: (..., natoms, ndim) broadcastable against pi/sigma of matching
        shape. Returns (...,) per-atom-summed values.
        """
        if bounded:
            exponent = -jnp.sum(
                (jnp.sqrt(1.0 + jnp.square(ae)) - 1.0) * jax.nn.softplus(pi),
                axis=-1)  # (..., natoms)
            weight = jnp.mean(sigma, axis=-1)  # (..., natoms)
            return jnp.sum(weight * jnp.exp(exponent), axis=-1)
        return jnp.sum(jnp.exp(-ae * pi) * sigma, axis=(-1, -2))

    def apply_per_electron(r_ae: jnp.ndarray, ae: jnp.ndarray, params) -> jnp.ndarray:
        """Returns (nelec,) envelope scalars, one per electron (row scaling).

        r_ae: (nelec, natoms, 1); ae: (nelec, natoms, ndim).
        """
        r2 = jnp.square(r_ae[..., 0])  # (nelec, natoms)
        gauss = jnp.sum(jnp.exp(-_decay_beta(params["beta"]) * r2),
                        axis=-1) * params["alpha"][:, 0]
        aniso = _aniso(ae, params["pi"], params["sigma"]) * params["xi"][:, 0]
        return gauss + aniso

    def apply_per_orbital(r_ae: jnp.ndarray, ae: jnp.ndarray, params) -> jnp.ndarray:
        """Returns (nelec, norb) envelope matrix (elementwise det scaling)."""
        r2 = jnp.square(r_ae[..., 0])  # (nelec, natoms)
        # (nelec, 1, natoms) vs (1, norb, natoms) -> (nelec, norb)
        gauss = jnp.sum(
            jnp.exp(-_decay_beta(params["beta"])[None, :, :] * r2[:, None, :]),
            axis=-1) * params["alpha"][None, :, 0]
        aniso = _aniso(ae[:, None], params["pi"][None],
                       params["sigma"][None]) * params["xi"][None, :, 0]
        return gauss + aniso

    return init, (apply_per_electron if per_electron else apply_per_orbital)
