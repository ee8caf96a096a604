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

        def _pot(x):
            _, _, r_ae, r_ee = construct_input_features(x, data.atoms)
            return coulomb.potential_energy(r_ae, r_ee, data.atoms, charges)

        pots = jax.vmap(_pot)(configs)                      # (K configs,)

        per_state = [jax.vmap(
            lambda x, p=p: _one(p, x, data.spins, data.atoms, data.charges))(
                configs) for p in params_list]
        sign_mat = jnp.stack([s for s, _, _ in per_state], axis=-1)  # (j, i)
        log_mat = jnp.stack([l for _, l, _ in per_state], axis=-1)
        kin_mat = jnp.stack([k for _, _, k in per_state], axis=-1)

        psi_mat = sign_mat * jnp.exp(log_mat - jnp.max(log_mat))
        hpsi_mat = psi_mat * (kin_mat + pots[:, None])
        energy_mat = jnp.linalg.solve(psi_mat, hpsi_mat)
        return jnp.trace(energy_mat), energy_mat

    return _e_l
