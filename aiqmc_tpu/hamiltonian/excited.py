"""Local energy of the excited-state total ansatz.

Capability parity with ref ``ferminet/hamiltonian.py:165-226``
(``excited_kinetic_energy_matrix`` / NES-VMC): the total ansatz
Psi(x_1..x_K) = det[psi_i(x_j)] lives on a K-fold extended configuration
space; its local energy under H_tot = sum_k H(x_k) is

    E_L,tot = sum_k V(x_k) - 1/2 (nabla^2 log|Psi| + |nabla log|Psi||^2)

with the Laplacian over ALL K * nelec * ndim coordinates. Optimising the
ordinary VMC loss of the total ansatz minimises sum_k E_k, yielding the K
lowest states (Pfau et al. 2023).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import chex
import jax
import jax.numpy as jnp

from aiqmc_tpu.hamiltonian import coulomb
from aiqmc_tpu.hamiltonian.kinetic import local_kinetic_energy
from aiqmc_tpu.models.features import construct_input_features


def local_energy(total_ansatz,
                 charges: jnp.ndarray,
                 nspins: Sequence[int],
                 states: int,
                 nelectrons: int,
                 ndim: int = 3,
                 complex_output: bool = False,
                 laplacian_chunk: Optional[int] = None):
    """Builds e_l(params, key, data) for the K-state total ansatz.

    data.positions: (states * nelectrons * ndim,) extended configuration.
    """
    del nspins
    ke = local_kinetic_energy(total_ansatz, complex_output=complex_output,
                              laplacian_chunk=laplacian_chunk)

    def _e_l(params, key: chex.PRNGKey, data
             ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        del key
        configs = jnp.reshape(data.positions, (states, nelectrons * ndim))
        potential = jnp.zeros(())
        for k in range(states):
            _, _, r_ae, r_ee = construct_input_features(configs[k], data.atoms)
            potential = potential + coulomb.potential_energy(
                r_ae, r_ee, data.atoms, charges)
        kinetic = ke(params, data)
        return potential + kinetic, None

    return _e_l


def local_energy_matrix(base_orbitals,
                        charges: jnp.ndarray,
                        states: int,
                        nelectrons: int,
                        ndim: int = 3):
    """Builds e_l(params_list, key, data) -> (E_total, energy_mat).

    The NES-VMC energy matrix (ref ferminet/hamiltonian.py:165-226,340-394):
    with M[j, i] = psi_i(x_j) and (HM)[j, i] = (H psi_i)(x_j),

        energy_mat = M^{-1} (HM),    E_L of det(M) = tr(energy_mat),

    so the ordinary VMC loss on the total ansatz equals the trace while the
    batch-averaged diagonal gives per-state energies (Pfau et al. 2023). The
    identity holds exactly per sample because the determinant is linear in
    each row (second derivatives of det w.r.t. two entries of the same row
    vanish), which ``tests/test_excited_vmc.py`` checks against the
    total-ansatz ``local_energy``.

    Per-state kinetic ratios K psi_i / psi_i = -1/2 (lap log|psi_i| +
    |grad log|psi_i||^2) come from one forward-Laplacian pass per (state,
    config) instead of the reference's jvp(grad) coordinate loop.

    Args:
      base_orbitals: single-state ``Network.orbitals`` callable.
      charges: (natoms,) nuclear charges.
      states: number K of states.
      nelectrons: electrons per single configuration.
    """
    from aiqmc_tpu.ops.forward_laplacian import (forward_laplacian,
                                                 logpsi_fwdlap)

    def _one(params, x, spins, atoms, charges_):
        orb = forward_laplacian(
            lambda y: base_orbitals(params, y, spins, atoms, charges_)[0])(x)
        sign, log, grad, lap = logpsi_fwdlap(orb)
        return sign, log, -0.5 * (lap + jnp.sum(grad ** 2))

    def _e_l(params_list, key: chex.PRNGKey, data
             ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        del key
        configs = jnp.reshape(data.positions, (states, nelectrons * ndim))
        pots = jax.vmap(lambda x: _potential(x, data.atoms, charges))(configs)

        per_state = [jax.vmap(
            lambda x, p=p: _one(p, x, data.spins, data.atoms, data.charges))(
                configs) for p in params_list]
        sign_mat = jnp.stack([s for s, _, _ in per_state], axis=-1)  # (j, i)
        log_mat = jnp.stack([l for _, l, _ in per_state], axis=-1)
        kin_mat = jnp.stack([k for _, _, k in per_state], axis=-1)
        return _energy_matrix(sign_mat, log_mat, kin_mat, pots)

    return _e_l


def _potential(x, atoms, charges):
    _, _, r_ae, r_ee = construct_input_features(x, atoms)
    return coulomb.potential_energy(r_ae, r_ee, atoms, charges)


def _energy_matrix(sign_mat, log_mat, kin_mat, pots):
    """(tr(M^-1 HM), M^-1 HM) from per-(config j, state i) sign/log/kinetic."""
    psi_mat = sign_mat * jnp.exp(log_mat - jnp.max(log_mat))
    hpsi_mat = psi_mat * (kin_mat + pots[:, None])
    energy_mat = jnp.linalg.solve(psi_mat, hpsi_mat)
    return jnp.trace(energy_mat), energy_mat


def local_energy_matrix_shared(base_orbitals,
                               charges: jnp.ndarray,
                               states: int,
                               nelectrons: int,
                               ndim: int = 3):
    """NES-VMC energy matrix for the SHARED-parameter state construction.

    ``base_orbitals`` is the base network's orbitals callable built with
    ``K * ndets`` determinants; psi_i sums determinant group i (upstream
    split, ref ferminet/networks.py:1273-1311). One forward-Laplacian pass
    per configuration yields sign/log/kinetic of ALL K states — K network
    differentiations per extended config instead of the legacy K^2 — by
    applying the logdet-sum combination per determinant group:

        psi_g = sum_{k in g} s_k exp(l_k),   w_k = s_k exp(l_k) / psi_g,
        grad log|psi_g| = sum w_k grad l_k,
        lap log|psi_g| = sum w_k (lap l_k + |grad l_k|^2) - |grad log psi_g|^2.
    """
    from aiqmc_tpu.ops.forward_laplacian import (forward_laplacian,
                                                 slogdet_fwdlap)

    def _all_states(params, x, spins, atoms, charges_):
        orb = forward_laplacian(
            lambda y: base_orbitals(params, y, spins, atoms, charges_)[0])(x)
        sign, logabs, grad, lap = slogdet_fwdlap(orb)  # (K*d,), grad (n, K*d)
        k = states
        sign_g = sign.reshape(k, -1)
        log_g = logabs.reshape(k, -1)
        grad_g = grad.reshape(grad.shape[0], k, -1)
        lap_g = lap.reshape(k, -1)
        m = jnp.max(log_g, axis=1, keepdims=True)
        terms = sign_g * jnp.exp(log_g - m)             # (K, d)
        s = jnp.sum(terms, axis=1)                      # (K,)
        w = terms / s[:, None]
        log_out = m[:, 0] + jnp.log(jnp.abs(s))
        sign_out = jnp.sign(s)
        grad_out = jnp.einsum("kd,nkd->nk", w, grad_g)  # (n, K)
        lap_out = (jnp.sum(w * (lap_g + jnp.sum(grad_g ** 2, axis=0)), axis=1)
                   - jnp.sum(grad_out ** 2, axis=0))
        kin = -0.5 * (lap_out + jnp.sum(grad_out ** 2, axis=0))
        return sign_out, log_out, kin                   # each (K states,)

    def _e_l(params, key: chex.PRNGKey, data
             ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        del key
        configs = jnp.reshape(data.positions, (states, nelectrons * ndim))
        pots = jax.vmap(lambda x: _potential(x, data.atoms, charges))(configs)
        # vmap over configs j -> matrices indexed [j, i].
        sign_mat, log_mat, kin_mat = jax.vmap(
            lambda x: _all_states(params, x, data.spins, data.atoms,
                                  data.charges))(configs)
        return _energy_matrix(sign_mat, log_mat, kin_mat, pots)

    return _e_l
