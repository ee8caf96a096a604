"""Observables: S^2, dipole moment, electron density.

Capability parity with ref ``ferminet/observables.py`` (the AIQMC trees have no
observables; the vendored upstream defines the capability ceiling):

  * ``make_s2``: <S^2> estimator via spin-pair swaps (Wang et al, JCP 102,
    3477 (1995)); the upstream evaluates the na x nb swapped configurations in
    nested ``fori_loop``s (observables.py:98-229) — here all swaps are one
    batched network evaluation (MXU-friendly).
  * ``make_dipole``: -<sum_i r_i> (observables.py:230-274).
  * ``make_density``: a histogram one-body density estimator (the upstream's
    full one-RDM machinery with auxiliary r' MCMC, density.py, is a separate
    follow-up; the histogram covers the common visualisation use).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.models.network import AINetData


def make_s2(signed_network, nspins: Tuple[int, int],
            complex_output: bool = False):
    """Returns s2(params, data) for one configuration (spin-assigned).

    complex_output: the network's first output is a phase ANGLE (complex or
    pair-complex mode, incl. twisted-real via pbc/twist.real_to_angle), so the
    swap-ratio phase factor is Re e^{i(phase_swap - phase)} = cos(dphase);
    real networks return a +-1 sign, where the plain product is the factor."""
    na, nb = sorted(nspins, reverse=True)
    nswaps = nspins[0] * nspins[1]

    def s2_estimator(params, data: AINetData) -> jnp.ndarray:
        n = sum(nspins)
        if n == 1:
            return jnp.asarray(0.75)
        s2_diagonal = (na - nb) / 2 * ((na - nb) / 2 + 1) + nb
        sign_psi, log_psi = signed_network(params, data.positions, data.spins,
                                           data.atoms, data.charges)
        if nswaps == 0:
            return jnp.asarray(s2_diagonal, dtype=log_psi.dtype)

        x = jnp.reshape(data.positions, (n, -1))
        xa, xb = x[:nspins[0]], x[nspins[0]:]
        ia, ib = np.meshgrid(np.arange(nspins[0]), np.arange(nspins[1]),
                             indexing="ij")
        ia, ib = ia.reshape(-1), ib.reshape(-1)

        def swapped_config(i, j):
            new_a = xa.at[i].set(xb[j])
            new_b = xb.at[j].set(xa[i])
            return jnp.concatenate([new_a, new_b]).reshape(-1)

        configs = jax.vmap(swapped_config)(jnp.asarray(ia), jnp.asarray(ib))
        sign_swap, log_swap = jax.vmap(
            signed_network, in_axes=(None, 0, None, None, None))(
                params, configs, data.spins, data.atoms, data.charges)
        if complex_output:
            phase_factor = jnp.cos(sign_swap - sign_psi)
        else:
            phase_factor = sign_psi * sign_swap
        ratios = phase_factor * jnp.exp(log_swap - log_psi)
        return s2_diagonal - jnp.sum(ratios)

    return s2_estimator


def make_dipole(signed_network=None):
    """Returns dipole(params, data) = -sum_i r_i for one configuration.

    (The expectation over |psi|^2 is taken by the batched caller; the network
    argument is kept for upstream API parity, observables.py:230-274.)"""
    del signed_network

    def dipole_estimator(params, data: AINetData) -> jnp.ndarray:
        del params
        return -jnp.sum(jnp.reshape(data.positions, (-1, 3)), axis=0)

    return dipole_estimator


def make_density(bins: int = 50, limit: float = 5.0,
                 center: Optional[jnp.ndarray] = None):
    """Returns density(data) -> (bins,) radial histogram counts for a batch."""

    def density_estimator(data: AINetData) -> jnp.ndarray:
        pos = jnp.reshape(data.positions, (-1, 3))
        origin = jnp.zeros((3,)) if center is None else center
        r = jnp.linalg.norm(pos - origin[None], axis=-1)
        hist, _ = jnp.histogram(r, bins=bins, range=(0.0, limit))
        return hist

    return density_estimator


def make_observable_fns(estimator, batched: bool = True):
    """Batches a per-configuration estimator over walker data (replaces the
    upstream pmap wrapper, ref observables.py:67-96: the mean over the global
    sharded batch IS the cross-device reduction under GSPMD)."""
    if not batched:
        return estimator

    def batched_fn(params, data: AINetData):
        per_walker = jax.vmap(
            estimator,
            in_axes=(None, AINetData(positions=0, spins=None, atoms=None,
                                     charges=None)))(params, data)
        return jnp.mean(per_walker, axis=0)

    return batched_fn
