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


def _state_matrix_apply(network, states: int, shared: bool):
    """(sign, log) state-matrix apply with entry [i, j] = psi_i(x_j)."""
    from aiqmc_tpu.models import excited as excited_lib
    if shared:
        return excited_lib.make_shared_state_matrix(network, states)[1]
    return excited_lib.make_state_matrix(network, states)[1]


def make_s2_states(network, nspins: Tuple[int, int], states: int,
                   shared: bool = True):
    """NES-VMC S^2 state-matrix estimator (ref ferminet/observables.py:152-209).

    With M[j, i] = psi_i(x_j) over the K-fold extended configuration and
    (S^2 M)[j, i] = (S^2 psi_i)(x_j) (Wang swap expansion per configuration),
    the local observable matrix is M^{-1} (S^2 M) — same row-linearity
    identity as the NES-VMC energy matrix (hamiltonian/excited.py). The
    batch mean's diagonal gives per-state <S^2>; off-diagonals are the
    transition matrix elements <psi_k|S^2|psi_i>/<psi_k|psi_k>-style mixing
    terms used to monitor state purity.

    The upstream evaluates the na*nb swaps in nested ``fori_loop``s of
    state-matrix calls; here all swaps of all K configurations are ONE
    batched state-matrix evaluation (MXU-friendly).

    Real (sign-representation) networks only, matching the upstream's
    spin-assigned-only scope.
    """
    sm_apply = _state_matrix_apply(network, states, shared)
    na, nb = sorted(nspins, reverse=True)
    nelec = sum(nspins)
    s2_diagonal = (na - nb) / 2 * ((na - nb) / 2 + 1) + nb
    nswaps = nspins[0] * nspins[1]

    def s2_estimator(params, data: AINetData) -> jnp.ndarray:
        if nelec == 1:
            return jnp.eye(states) * 0.75
        sign_mat, log_mat = sm_apply(params, data.positions, data.spins,
                                     data.atoms, data.charges)  # [i, j]
        log_max = jnp.max(log_mat)
        psi = (sign_mat * jnp.exp(log_mat - log_max)).T  # M[j, i]
        s2 = s2_diagonal * psi
        if nswaps:
            x = jnp.reshape(data.positions, (states, nelec, -1))
            xa, xb = x[:, :nspins[0]], x[:, nspins[0]:]
            ia, ib = np.meshgrid(np.arange(nspins[0]), np.arange(nspins[1]),
                                 indexing="ij")
            ia, ib = ia.reshape(-1), ib.reshape(-1)

            def swapped_config(i, j):
                # Swap alpha-i with beta-j in EVERY one of the K stacked
                # configurations at once (the operator acts per config row).
                new_a = xa.at[:, i].set(xb[:, j])
                new_b = xb.at[:, j].set(xa[:, i])
                return jnp.concatenate([new_a, new_b], axis=1).reshape(-1)

            configs = jax.vmap(swapped_config)(jnp.asarray(ia),
                                               jnp.asarray(ib))
            sign_sw, log_sw = jax.vmap(
                sm_apply, in_axes=(None, 0, None, None, None))(
                    params, configs, data.spins, data.atoms, data.charges)
            # Same log_max shift as psi so the solve below is exact.
            swaps = sign_sw * jnp.exp(log_sw - log_max)  # (nswaps, i, j)
            s2 = s2 - jnp.sum(swaps, axis=0).T
        return jnp.linalg.solve(psi, s2)  # (K, K)

    return s2_estimator


def make_dipole_states(network, states: int, shared: bool = True):
    """NES-VMC dipole state-matrix estimator (ref observables.py:230-274).

    The dipole operator is multiplicative, so (O_d M)[j, i] =
    m_d(x_j) M[j, i] with m_d(x_j) = -sum_e r_{e,d} of configuration j
    (electron charge -1, same sign convention as ``make_dipole``; the
    upstream returns +sum r). Local matrix: M^{-1} diag(m_d) M per
    component d — batch-mean diagonal gives per-state dipoles,
    off-diagonals the transition dipoles (oscillator strengths)."""
    sm_apply = _state_matrix_apply(network, states, shared)

    def dipole_estimator(params, data: AINetData) -> jnp.ndarray:
        sign_mat, log_mat = sm_apply(params, data.positions, data.spins,
                                     data.atoms, data.charges)
        psi = (sign_mat * jnp.exp(log_mat - jnp.max(log_mat))).T  # M[j, i]
        mean_pos = -jnp.sum(
            jnp.reshape(data.positions, (states, -1, 3)), axis=1)  # (j, 3)
        rhs = mean_pos.T[:, :, None] * psi[None]  # (3, j, i) = diag(m_d) M
        return jnp.linalg.solve(psi[None], rhs)  # (3, K, K)

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
