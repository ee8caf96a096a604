"""All-electron Metropolis-adjusted Langevin (MALA) sampler.

A large-system alternative to the reference's per-electron drift-diffusion
sweep (ref VMC/VMCmcstep.py:28-111): ONE gradient evaluation proposes a move
of ALL electrons along the drift 2*grad(log|psi|) with an exact MH correction
(forward/backward Gaussian transition ratio), so the per-step network-eval
count is O(1) instead of O(nelectrons). The drift is Cyrus-Umrigar limited
(same limiter as the reference sampler) to keep proposals finite near nodes.

Detailed balance holds exactly: the acceptance uses the asymmetric proposal
densities q(x'|x) = N(x + tau*d(x), 2*tau) with d the LIMITED drift, i.e. the
same d in forward and reverse terms.
"""

from __future__ import annotations

from typing import Tuple

import chex
import jax
import jax.numpy as jnp
from jax import lax

from aiqmc_tpu.models.network import AINetData


def limdrift(g: jnp.ndarray, tau: float, acyrus: float = 0.25) -> jnp.ndarray:
    """Cyrus-Umrigar drift limiting (ref VMCmcstep.py:11-14), per electron."""
    g3 = g.reshape(-1, 3)
    v2 = jnp.sum(g3 * g3, axis=-1, keepdims=True)
    taueff = (jnp.sqrt(1.0 + 2.0 * tau * acyrus * v2) - 1.0) / (
        acyrus * v2 + 1e-30)
    return (g3 * taueff / tau).reshape(g.shape)


def make_mala_step(logabs_network, tstep: float, steps: int = 10,
                   lattice=None):
    """Builds mala_step(params, data, key, width_unused) -> (data, pmove).

    logabs_network: single-config (params, pos, spins, atoms, charges) ->
    log|psi|. The |psi|^2 drift is 2*grad(log|psi|), limited per electron.
    """

    def mala_step(params, data: AINetData, key: chex.PRNGKey, width=None):
        del width

        def logp_and_drift(x):
            def f(y):
                return logabs_network(params, y, data.spins, data.atoms,
                                      data.charges)
            lp, g = jax.value_and_grad(f)(x)
            return 2.0 * lp, limdrift(2.0 * g, tstep)

        batch_lpd = jax.vmap(logp_and_drift)

        def body(i, carry):
            x, lp, drift, key, acc = carry
            key, pkey, akey = jax.random.split(key, 3)
            noise = jnp.sqrt(2.0 * tstep) * jax.random.normal(
                pkey, shape=x.shape)
            x2 = x + tstep * drift + noise
            lp2, drift2 = batch_lpd(x2)
            # log q(x|x2) - log q(x2|x): Gaussian transition densities.
            fwd = -jnp.sum((x2 - x - tstep * drift) ** 2, axis=-1)
            bwd = -jnp.sum((x - x2 - tstep * drift2) ** 2, axis=-1)
            log_ratio = lp2 - lp + (bwd - fwd) / (4.0 * tstep)
            rnd = jnp.log(jax.random.uniform(akey, shape=lp.shape))
            cond = (log_ratio > rnd) | (~jnp.isfinite(lp) & jnp.isfinite(lp2))
            x = jnp.where(cond[:, None], x2, x)
            lp = jnp.where(cond, lp2, lp)
            drift = jnp.where(cond[:, None], drift2, drift)
            return x, lp, drift, key, acc + jnp.mean(cond.astype(x.dtype))

        lp0, drift0 = batch_lpd(data.positions)
        x, _, _, _, acc = lax.fori_loop(
            0, steps, body, (data.positions, lp0, drift0, key, jnp.zeros(())))
        if lattice is not None:
            from aiqmc_tpu.pbc.enforce import enforce_pbc
            x = enforce_pbc(lattice, x)
        new_data = AINetData(**(dict(data) | {"positions": x}))
        return new_data, acc / steps

    return mala_step


def stationarity_check(logabs_network, params, data: AINetData, tstep: float,
                       key: chex.PRNGKey, rounds: int = 5,
                       steps: int = 20) -> Tuple[AINetData, jnp.ndarray]:
    """Utility: run MALA rounds, returning data + per-round mean log|psi|."""
    step = jax.jit(make_mala_step(logabs_network, tstep, steps))
    means = []
    for i in range(rounds):
        key, subkey = jax.random.split(key)
        data, _ = step(params, data, subkey)
        lp = jax.vmap(lambda x: logabs_network(params, x, data.spins,
                                               data.atoms, data.charges))(
                                                   data.positions)
        means.append(jnp.mean(lp))
    return data, jnp.stack(means)
