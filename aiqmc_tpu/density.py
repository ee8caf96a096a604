"""One-body reduced density matrix and density estimators.

Capability parity with ref ``ferminet/observables.py:275-407`` +
``ferminet/density.py`` (one-RDM estimation): the upstream samples the primed
coordinate r' with an auxiliary MCMC against an HF density (pyscf-backed);
pyscf is absent here, so r' runs over a user-supplied quadrature/grid of
points and the estimator is

    rho_1(r', r_1) ~ < psi(r_1 -> r') / psi(x) >_{|psi|^2}

evaluated for all (walker, grid point) pairs in ONE batched network call — the
same fused psi-ratio machinery as the nonlocal ECP (hamiltonian/ecp.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from aiqmc_tpu.models import blocks
from aiqmc_tpu.models.network import AINetData


def make_one_rdm(signed_network, nelectrons: int, ndim: int = 3,
                 electron: int = 0, complex_output: bool = False):
    """Returns rdm(params, data, rprime) -> per-walker psi-ratio row.

    rprime: (npoints, ndim) primed positions. Output: (batch, npoints) of
    Re[psi(x with electron -> r') / psi(x)]; its |psi|^2 average over walkers
    is (up to the r'-measure) a row of the one-RDM against electron 0's
    coordinate.
    """

    def single(params, pos, spins, atoms, charges, rprime):
        phase0, mag0 = signed_network(params, pos, spins, atoms, charges)
        npts = rprime.shape[0]
        base = jnp.broadcast_to(pos, (npts, nelectrons * ndim))
        mask = jnp.zeros((nelectrons * ndim,)).at[
            electron * ndim:(electron + 1) * ndim].set(1.0)
        repl = jnp.tile(rprime, (1, nelectrons))
        configs = base * (1.0 - mask)[None] + repl * mask[None]
        phases, mags = jax.vmap(
            lambda x: signed_network(params, x, spins, atoms, charges))(configs)
        ratio_re, _ = blocks.psi_ratio_real_imag(mags - mag0, phases, phase0,
                                                 complex_output)
        return ratio_re

    def rdm(params, data: AINetData, rprime: jnp.ndarray) -> jnp.ndarray:
        return jax.vmap(
            single, in_axes=(None, 0, None, None, None, None))(
                params, data.positions, data.spins, data.atoms, data.charges,
                rprime)

    return rdm


def radial_density_profile(data: AINetData, bins: int = 64,
                           limit: float = 6.0,
                           center=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spherically averaged electron density n(r) from walker samples."""
    pos = jnp.reshape(data.positions, (data.positions.shape[0], -1, 3))
    origin = jnp.zeros((3,)) if center is None else jnp.asarray(center)
    r = jnp.linalg.norm(pos - origin[None, None], axis=-1).reshape(-1)
    hist, edges = jnp.histogram(r, bins=bins, range=(0.0, limit))
    mids = 0.5 * (edges[1:] + edges[:-1])
    shell = 4.0 * jnp.pi * mids ** 2 * (edges[1] - edges[0])
    nwalkers = data.positions.shape[0]
    return mids, hist / (shell * nwalkers)


# ---------------------------------------------------------------------------
# One-RDM with an auxiliary r' MCMC chain against the HF one-electron density
# (ref ferminet/observables.py:275-407 + ferminet/density.py:84-301), driven by
# the built-in STO-3G RHF instead of pyscf.
# ---------------------------------------------------------------------------

import chex


@chex.dataclass
class DensityState:
    """Auxiliary r' chain state (ref ferminet/observables.py:32-64)."""
    t: jnp.ndarray            # step counter
    positions: jnp.ndarray    # (batch, ndim) primed positions
    probabilities: jnp.ndarray  # p_HF at positions
    move_width: jnp.ndarray   # RW proposal width


def make_one_rdm_aux(signed_network, atoms, charges, nspins,
                     ndim: int = 3, mcmc_steps: int = 10,
                     complex_output: bool = False, basis=None):
    """One-RDM in the HF molecular-orbital basis via importance sampling.

        rho^s_ij = N_s * E_{x ~ |psi|^2, r' ~ p_HF} [
            phi_i(r_s) phi_j(r') psi(x: r_s -> r') / (psi(x) p_HF(r')) ]

    with r_s the first electron of spin channel s and p_HF the (analytically
    normalised) HF one-electron density mean_occ |phi|^2
    (ref ferminet/density.py:53-83,170-301). For the HF determinant itself this
    gives rho^s = diag(occupations), which tests/test_density.py verifies.

    Returns (init, update, estimator):
      init(key, data) -> DensityState seeded from walker electron positions.
      update(params, state, key) -> DensityState after `mcmc_steps` RW-MH moves
        of r' against p_HF, with a jittable width adaptation toward
        pmove ~ 0.5-0.55 (ref ferminet/mcmc.py:293-327 semantics).
      estimator(params, data, state) -> (nchannels, norb, norb) rho sample.
    """
    from aiqmc_tpu.utils import scf as scf_lib

    nelectrons = int(nspins[0] + nspins[1])
    rhf = scf_lib.run_rhf(atoms, charges,
                          nelectrons=nelectrons - (nelectrons % 2),
                          basis=basis)
    basis = rhf.basis
    mo = jnp.asarray(rhf.mo_coeff)
    nocc = rhf.nocc

    from aiqmc_tpu.utils.gto import eval_basis

    def hf_prob(r):
        """p_HF(r) for (..., ndim) points."""
        occ = eval_basis(basis, r) @ mo[:, :nocc]
        return jnp.mean(occ ** 2, axis=-1)

    def init(key: chex.PRNGKey, data: AINetData) -> DensityState:
        batch = data.positions.shape[0]
        pos = jnp.reshape(data.positions, (batch, -1, ndim))
        idx = jax.random.randint(key, (batch,), 0, pos.shape[1])
        rprime = jnp.take_along_axis(pos, idx[:, None, None], axis=1)[:, 0]
        return DensityState(t=jnp.zeros((), jnp.int32), positions=rprime,
                            probabilities=hf_prob(rprime),
                            move_width=jnp.asarray(0.4))

    def update(params, state: DensityState, key: chex.PRNGKey) -> DensityState:
        del params

        def body(i, carry):
            pos, logp, naccept, key_ = carry
            key_, k1, k2 = jax.random.split(key_, 3)
            prop = pos + state.move_width * jax.random.normal(k1, pos.shape)
            logp_new = jnp.log(hf_prob(prop) + 1e-300)
            accept = (jnp.log(jax.random.uniform(k2, logp.shape))
                      < logp_new - logp)
            pos = jnp.where(accept[:, None], prop, pos)
            logp = jnp.where(accept, logp_new, logp)
            return pos, logp, naccept + jnp.mean(accept), key_

        logp0 = jnp.log(state.probabilities + 1e-300)
        pos, logp, nacc, _ = jax.lax.fori_loop(
            0, mcmc_steps, body,
            (state.positions, logp0, jnp.zeros(()), key))
        pmove = nacc / mcmc_steps
        width = state.move_width * jnp.where(
            pmove > 0.55, 1.1, jnp.where(pmove < 0.5, 0.9, 1.0))
        return DensityState(t=state.t + 1, positions=pos,
                            probabilities=jnp.exp(logp), move_width=width)

    def estimator(params, data: AINetData, state: DensityState) -> jnp.ndarray:
        batch_net = jax.vmap(signed_network,
                             in_axes=(None, 0, None, None, None))
        signs_d, logs_d = batch_net(params, data.positions, data.spins,
                                    data.atoms, data.charges)
        phi_j = eval_basis(basis, state.positions) @ mo   # (B, norb)
        inv_p = 1.0 / state.probabilities
        channels = (0, nspins[0]) if nspins[1] > 0 else (0,)
        rhos = []
        for spin, i0 in enumerate(channels):
            pos2 = data.positions.at[:, i0 * ndim:(i0 + 1) * ndim].set(
                state.positions)
            signs_n, logs_n = batch_net(params, pos2, data.spins, data.atoms,
                                        data.charges)
            # Angle-output networks (complex/pair/twisted-real): the ratio's
            # phase factor is Re e^{i(phase_n - phase_d)}; real networks
            # return +-1 signs, where the plain product is the factor.
            if complex_output:
                phase_factor = jnp.cos(signs_n - signs_d)
            else:
                phase_factor = signs_n * signs_d
            ratio = phase_factor * jnp.exp(logs_n - logs_d)
            r1 = data.positions[:, i0 * ndim:(i0 + 1) * ndim]
            phi_i = eval_basis(basis, r1) @ mo
            w = ratio * inv_p
            rho = nspins[spin] * jnp.mean(
                phi_i[:, :, None] * phi_j[:, None, :] * w[:, None, None],
                axis=0)
            rhos.append(rho)
        return jnp.stack(rhos)

    return init, update, estimator


def make_one_rdm_states_aux(state_signs_logs, atoms, charges, nspins,
                            states: int, ndim: int = 3,
                            mcmc_steps: int = 10, basis=None):
    """One-RDM STATE MATRICES for NES-VMC excited states.

    Extends ``make_one_rdm_aux`` to the K-state shared ansatz Psi = det M
    (ref ferminet/density.py:247-271, the `use_excited` branch): the one-body
    operator acts per configuration, so by determinant row-linearity its
    local value is the K x K matrix M^{-1} A with

        A[j, l] = N_s phi_a(r_s(x_j)) phi_b(r'_j) psi_l(x_j: r_s -> r'_j)
                  / p_HF(r'_j),

    one auxiliary r' per (walker, configuration). The batch mean's diagonal
    [k, k] gives state-k one-RDMs (HF-determinant oracle: diag(occupations of
    excitation k)); off-diagonals are TRANSITION one-RDMs — natural
    transition orbitals / oscillator strengths beyond the dipole.

    Args:
      state_signs_logs: f(params, config, spins, atoms, charges) ->
        (signs (K,), logs (K,)) of every state at ONE configuration
        (``excited.make_shared_state_signs_logs`` or a same-contract stub).

    Returns (init, update, estimator); estimator output
    (nchannels, norb, norb, K, K).
    """
    from aiqmc_tpu.utils import scf as scf_lib
    from aiqmc_tpu.utils.gto import eval_basis

    nelectrons = int(nspins[0] + nspins[1])
    rhf = scf_lib.run_rhf(atoms, charges,
                          nelectrons=nelectrons - (nelectrons % 2),
                          basis=basis)
    basis = rhf.basis
    mo = jnp.asarray(rhf.mo_coeff)
    # The r' proposal must COVER the excited orbitals: the upstream samples
    # p_HF over ground-occupied orbitals only (ref density.py:53-81), which
    # is an unbiased but heavy-tailed importance function for excited-state
    # elements (a diffuse phi_virtual barely overlaps |phi_occ|^2 — measured
    # 0.45 vs 1.0 on the He dn 0->1 oracle at batch 2048). Including the
    # lowest nocc + states orbitals in the proposal mean fixes the tail.
    nprop = min(mo.shape[1], rhf.nocc + states)

    def hf_prob(r):
        occ = eval_basis(basis, r) @ mo[:, :nprop]
        return jnp.mean(occ ** 2, axis=-1)

    def init(key: chex.PRNGKey, data: AINetData) -> DensityState:
        batch = data.positions.shape[0]
        pos = jnp.reshape(data.positions, (batch * states, -1, ndim))
        idx = jax.random.randint(key, (batch * states,), 0, pos.shape[1])
        rprime = jnp.take_along_axis(pos, idx[:, None, None], axis=1)[:, 0]
        return DensityState(t=jnp.zeros((), jnp.int32), positions=rprime,
                            probabilities=hf_prob(rprime),
                            move_width=jnp.asarray(0.4))

    def update(params, state: DensityState, key: chex.PRNGKey) -> DensityState:
        del params

        def body(i, carry):
            pos, logp, naccept, key_ = carry
            key_, k1, k2 = jax.random.split(key_, 3)
            prop = pos + state.move_width * jax.random.normal(k1, pos.shape)
            logp_new = jnp.log(hf_prob(prop) + 1e-300)
            accept = (jnp.log(jax.random.uniform(k2, logp.shape))
                      < logp_new - logp)
            pos = jnp.where(accept[:, None], prop, pos)
            logp = jnp.where(accept, logp_new, logp)
            return pos, logp, naccept + jnp.mean(accept), key_

        logp0 = jnp.log(state.probabilities + 1e-300)
        pos, logp, nacc, _ = jax.lax.fori_loop(
            0, mcmc_steps, body,
            (state.positions, logp0, jnp.zeros(()), key))
        pmove = nacc / mcmc_steps
        width = state.move_width * jnp.where(
            pmove > 0.55, 1.1, jnp.where(pmove < 0.5, 0.9, 1.0))
        return DensityState(t=state.t + 1, positions=pos,
                            probabilities=jnp.exp(logp), move_width=width)

    def estimator(params, data: AINetData, state: DensityState) -> jnp.ndarray:
        batch = data.positions.shape[0]
        configs = jnp.reshape(data.positions, (batch, states, -1))
        rprime = jnp.reshape(state.positions, (batch, states, ndim))
        inv_p = 1.0 / jnp.reshape(state.probabilities, (batch, states))

        def all_states(x):
            return state_signs_logs(params, x, data.spins, data.atoms,
                                    data.charges)

        eval_grid = jax.vmap(jax.vmap(all_states))     # (B, K_cfg) configs
        signs, logs = eval_grid(configs)               # (B, K_cfg, K_state)
        logmax = jnp.max(logs, axis=(1, 2), keepdims=True)
        m_mat = signs * jnp.exp(logs - logmax)         # M[j, i] per walker

        channels = (0, nspins[0]) if nspins[1] > 0 else (0,)
        rhos = []
        for spin, i0 in enumerate(channels):
            replaced = configs.at[:, :, i0 * ndim:(i0 + 1) * ndim].set(rprime)
            signs_r, logs_r = eval_grid(replaced)
            p_mat = signs_r * jnp.exp(logs_r - logmax)  # A-part [j, l]
            r1 = configs[:, :, i0 * ndim:(i0 + 1) * ndim]
            phi_i = eval_basis(basis, r1.reshape(-1, ndim)) @ mo
            phi_i = phi_i.reshape(batch, states, -1)    # u_j(a)
            phi_j = eval_basis(basis, rprime.reshape(-1, ndim)) @ mo
            phi_j = phi_j.reshape(batch, states, -1)    # v_j(b)

            def one_walker(m, p, u, v, w):
                # rho[a, b, k, l] = sum_j M^{-1}[k, j] u[j, a] v[j, b]
                #                          P[j, l] w[j]
                # (the per-j weights sit INSIDE the contraction, so a single
                # solve cannot absorb them for all (a, b) at once — invert
                # once and einsum).
                inv_m = jnp.linalg.inv(m)
                return jnp.einsum("kj,ja,jb,jl,j->abkl", inv_m, u, v, p, w)

            rho = jax.vmap(one_walker)(m_mat, p_mat, phi_i, phi_j, inv_p)
            rhos.append(nspins[spin] * jnp.mean(rho, axis=0))
        return jnp.stack(rhos)

    return init, update, estimator
