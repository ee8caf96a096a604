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
