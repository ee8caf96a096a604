"""Excited states: state matrix and total ansatz.

Capability parity with ref ``ferminet/networks.py:1273-1348``
(``make_state_matrix`` / ``make_total_ansatz``, the NES-VMC construction of
Pfau et al. 2023 "Natural excited states"): K states are represented by one
network producing K wavefunctions; the total ansatz over a K-fold extended
configuration is det[psi_i(x_j)], which is optimised with ordinary VMC and
yields the K lowest states without penalty terms.

Two parameterisations:

* **Shared (default, upstream parity)**: ONE network with K x ndets
  determinants and shared layers; psi_i sums determinant group i
  (``make_shared_state_matrix``, ref networks.py:1273-1311). One parameter
  tree, one optimizer state, one KFAC layer registry, and — because every
  state comes from the same orbital tensor — ONE network evaluation per
  configuration yields all K states (K evals per extended config total).
* **Independent copies (legacy)**: K full parameter copies of the base
  network (``make_state_matrix``), K^2 network evaluations per extended
  config. Exactly independent states, K x the parameters; kept behind
  ``cfg.system.excited_param_copies`` for comparison runs.
"""

from __future__ import annotations

from typing import Tuple

import chex
import jax
import jax.numpy as jnp

from aiqmc_tpu.models import blocks as network_blocks
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
        return _slogdet_state_matrix(sign_mat, log_mat, states)

    return sm_init, apply


def _slogdet_state_matrix(sign_mat, log_mat, states):
    logmax = jnp.max(log_mat)
    mat = sign_mat * jnp.exp(log_mat - logmax)
    sign, logdet = jnp.linalg.slogdet(mat)
    return sign, logdet + states * logmax


# ---------------------------------------------------------------------------
# Shared-parameter states: one network, K determinant groups
# (upstream parity: ref ferminet/networks.py:1273-1311 evaluates ONE set of
# shared layers and splits the determinant list into K per-state groups).
# ---------------------------------------------------------------------------

def make_shared_state_signs_logs(network: Network, states: int):
    """Returns f(params, pos, spins, atoms, charges) -> (signs, logs), the
    values of ALL K states at one configuration from ONE network evaluation.

    ``network`` must be the base network built with ``K * ndets``
    determinants (real orbitals); psi_i sums determinant group i with the
    standard logdet_matmul semantics."""
    if network.orbitals is None:
        raise ValueError("shared excited states need network.orbitals")

    def signs_logs(params, pos, spins, atoms, charges):
        orbitals = network.orbitals(params, pos, spins, atoms, charges)
        if len(orbitals) != 1 or isinstance(orbitals[0], tuple):
            raise NotImplementedError(
                "shared excited states support real single-block orbitals")
        dets = orbitals[0]  # (K * ndets, nelec, nelec)
        if dets.shape[0] % states:
            raise ValueError(
                f"{dets.shape[0]} determinants do not split into {states} "
                "state groups — build the base network with determinants = "
                "states * ndets_per_state")
        mats = dets.reshape((states, -1) + dets.shape[1:])
        return jax.vmap(lambda m: network_blocks.logdet_matmul([m]))(mats)

    return signs_logs


def make_shared_state_matrix(network: Network, states: int):
    """Shared-parameter state matrix psi_i(x_j) (ref networks.py:1273-1311).

    Returns (init, apply): init is the base network's (ONE parameter tree);
    apply maps the K-fold extended configuration to (sign (K, K), log (K, K))
    with entry [i, j] = psi_i(x_j) — K network evaluations total instead of
    the legacy K^2."""
    signs_logs = make_shared_state_signs_logs(network, states)

    def apply(params, positions, spins, atoms, charges
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        configs = jnp.reshape(positions, (states, -1))
        # Static unroll over the K configurations (NOT vmap): K is small and
        # each iteration is a full network evaluation, so the unroll costs
        # nothing — and it keeps the dense-layer activation tape readable by
        # optim.kfac (a vmap here would trap the taped activations inside the
        # vmap trace; kfac's per-call probes rely on seeing K separate calls).
        rows = [signs_logs(params, configs[j], spins, atoms, charges)
                for j in range(states)]
        signs = jnp.stack([r[0] for r in rows], axis=-1)  # [i, j] = psi_i(x_j)
        logs = jnp.stack([r[1] for r in rows], axis=-1)
        return signs, logs

    return network.init, apply


def make_shared_total_ansatz(network: Network, states: int):
    """Total ansatz det[psi_i(x_j)] over ONE shared parameter tree."""
    sm_init, sm_apply = make_shared_state_matrix(network, states)

    def apply(params, positions, spins, atoms, charges):
        sign_mat, log_mat = sm_apply(params, positions, spins, atoms, charges)
        return _slogdet_state_matrix(sign_mat, log_mat, states)

    return sm_init, apply
