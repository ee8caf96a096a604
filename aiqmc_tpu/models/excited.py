"""Excited states: state matrix and total ansatz.

Capability parity with ref ``ferminet/networks.py:1273-1348``
(``make_state_matrix`` / ``make_total_ansatz``, the NES-VMC construction of
Pfau et al. 2023 "Natural excited states"): K states are represented by one
network producing K wavefunctions; the total ansatz over a K-fold extended
configuration is det[psi_i(x_j)], which is optimised with ordinary VMC and
yields the K lowest states without penalty terms.

Here the K wavefunctions come from K parameter copies of the base network (a
simple, exactly-independent parameterisation; the upstream shares layers and
splits determinant groups — both satisfy the NES requirements).
"""

from __future__ import annotations

from typing import Tuple

import chex
import jax
import jax.numpy as jnp

from aiqmc_tpu.models.network import Network


def make_state_matrix(network: Network, states: int):
    """Returns (init, apply) where apply gives sign/log of psi_i(x_j).

    positions: (states * nelec * ndim,) holding K stacked configurations.
    Output: (sign (K, K), log (K, K)) with entry [i, j] = psi_i(x_j).
    """

    def init(key: chex.PRNGKey):
        keys = jax.random.split(key, num=states)
        return [network.init(k) for k in keys]

    def apply(params_list, positions, spins, atoms, charges
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        configs = jnp.reshape(positions, (states, -1))

        def psi_i_of_xj(params):
            def one_config(x):
                return network.apply(params, x, spins, atoms, charges)

            return jax.vmap(one_config)(configs)  # (K,), (K,)

        signs, logs = zip(*[psi_i_of_xj(p) for p in params_list])
        return jnp.stack(signs), jnp.stack(logs)  # (K states, K configs)

    return init, apply


def make_total_ansatz(network: Network, states: int):
    """Returns (init, apply) of the total ansatz Psi = det[psi_i(x_j)]
    (ref networks.py:1313-1348). apply has the standard (phase, log) signature
    over the extended configuration."""
    sm_init, sm_apply = make_state_matrix(network, states)

    def apply(params_list, positions, spins, atoms, charges):
        sign_mat, log_mat = sm_apply(params_list, positions, spins, atoms,
                                     charges)
        logmax = jnp.max(log_mat)
        mat = sign_mat * jnp.exp(log_mat - logmax)
        sign, logdet = jnp.linalg.slogdet(mat)
        return sign, logdet + states * logmax

    return sm_init, apply
