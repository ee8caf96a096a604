"""Drift-diffusion Metropolis-Hastings sampler (VMC).

Capability parity with ref ``AIQMCrelease3/VMC/VMCmcstep.py``: per-electron
drift+diffusion proposals with a forward/backward Green's-function ratio and
Cyrus-Umrigar drift limiting, run ``nsteps`` sweeps inside one jitted
``lax.fori_loop``.

Correctness/TPU redesign vs the reference:
  * Electrons are updated SEQUENTIALLY within a sweep (``lax.scan`` over the
    electron index, each sub-step a full walker-batch ``value_and_grad``). The
    reference proposes every electron's move from the same starting
    configuration, accepts each independently, and applies all accepted moves
    at once (VMCmcstep.py:28-111) — a composite kernel that violates detailed
    balance and produces variationally inconsistent energies (measured ~1 Ha
    low on He at fixed psi).
  * Drift limiting is per-electron (the reference reduces v^2 over the whole
    (batch, 3N) tensor, coupling all walkers; VMCmcstep.py:11-14).
  * The Green's-function exponent is summed over coordinates before
    exponentiation and reuses the actual proposal noise (the reference sums
    exp() over coordinates and redraws fresh noise for the reverse kernel,
    VMCmcstep.py:83-88).
  * Walkers whose current log|psi| is non-finite force-accept finite proposals
    (escape hatch), so a singular configuration cannot poison the batch
    forever.

Per sweep: nelectrons + 1 batched network evaluations (value+grad fused), each
a (batch,)-wide computation that tiles onto the MXU.
"""

from __future__ import annotations

from typing import Tuple

import chex
import jax
import jax.numpy as jnp
from jax import lax

from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.utils.utils import select_output


def limdrift_electron(g: jnp.ndarray, tau: float, acyrus: float) -> jnp.ndarray:
    """Cyrus-Umrigar limited drift velocity for one electron's (..., 3) grad.

    Non-finite gradient components (e.g. the norm gradient at exactly
    coincident particles) are replaced by zero drift so the walker still
    diffuses rather than proposing NaN moves forever.
    """
    g = jnp.where(jnp.isfinite(g), g, 0.0)
    v2 = jnp.sum(g ** 2, axis=-1, keepdims=True)
    taueff = (jnp.sqrt(1.0 + 2.0 * tau * acyrus * v2) - 1.0) / (acyrus * v2 + 1e-12)
    return g * taueff / tau


def limdrift(g: jnp.ndarray, tau: float, acyrus: float, nelectrons: int,
             ndim: int) -> jnp.ndarray:
    """Per-electron limited drift velocity on flat (..., nelec*ndim) grads."""
    shape = g.shape
    g = g.reshape(shape[:-1] + (nelectrons, ndim))
    out = limdrift_electron(g, tau, acyrus)
    return out.reshape(shape)


def walkers_update(logabs_f,
                   params,
                   data: AINetData,
                   key: chex.PRNGKey,
                   tstep: float,
                   ndim: int,
                   nelectrons: int,
                   batch_size: int,
                   i: int = 0) -> Tuple[AINetData, chex.PRNGKey, jnp.ndarray]:
    """One sequential sweep of per-electron drift-diffusion moves.

    Returns (new_data, new_key, mean acceptance over electrons and walkers).
    """
    del i
    spins, atoms, charges = data.spins, data.atoms, data.charges

    def vag_closure(x):
        return jax.value_and_grad(logabs_f, argnums=1)(
            params, x, spins, atoms, charges)

    batch_vag = jax.vmap(vag_closure)

    x0 = data.positions.reshape(batch_size, nelectrons, ndim)
    logpsi0, grad0 = batch_vag(data.positions)
    grad0 = grad0.reshape(batch_size, nelectrons, ndim)

    def electron_step(carry, e):
        x, logpsi, grad, key = carry
        key, noise_key, accept_key = jax.random.split(key, num=3)
        ge = jnp.take(grad, e, axis=1)  # (batch, 3)
        v = limdrift_electron(ge, tstep, 0.25)
        gauss = jnp.sqrt(tstep) * jax.random.normal(noise_key,
                                                    (batch_size, ndim))
        move = v * tstep + gauss
        onehot = jax.nn.one_hot(e, nelectrons, dtype=x.dtype)  # (nelec,)
        x_new = x + onehot[None, :, None] * move[:, None, :]

        logpsi2, grad2 = batch_vag(x_new.reshape(batch_size, -1))
        grad2 = grad2.reshape(batch_size, nelectrons, ndim)
        g2e = jnp.take(grad2, e, axis=1)
        v2 = limdrift_electron(g2e, tstep, 0.25)

        forward = jnp.sum(gauss ** 2, axis=-1)
        backward = jnp.sum((gauss + (v + v2) * tstep) ** 2, axis=-1)
        log_t = (forward - backward) / (2.0 * tstep)
        log_ratio = 2.0 * (logpsi2 - logpsi) + log_t
        acceptance = jnp.exp(jnp.minimum(log_ratio, 0.0))
        acceptance = jnp.where(jnp.isfinite(acceptance), acceptance, 0.0)
        rnd = jax.random.uniform(accept_key, shape=acceptance.shape)
        stuck = ~jnp.isfinite(logpsi) & jnp.isfinite(logpsi2)
        accept = (acceptance > rnd) | stuck

        x = jnp.where(accept[:, None, None], x_new, x)
        logpsi = jnp.where(accept, logpsi2, logpsi)
        grad = jnp.where(accept[:, None, None], grad2, grad)
        return (x, logpsi, grad, key), jnp.mean(acceptance)

    (x, _, _, key), pmoves = lax.scan(
        electron_step, (x0, logpsi0, grad0, key), jnp.arange(nelectrons))
    new_data = AINetData(**(dict(data) |
                            {"positions": x.reshape(batch_size, -1)}))
    return new_data, key, jnp.mean(pmoves)


def main_monte_carlo(f,
                     tstep: float,
                     ndim: int,
                     nelectrons: int,
                     nsteps: int,
                     batch_size: int,
                     lattice=None):
    """Builds mc_step(params, data, key) running nsteps sweeps under jit
    (ref VMCmcstep.py:121-140). Returns (new_data, mean acceptance).

    ``lattice`` wraps walkers into the primitive cell after the sweeps
    (ref PBC/enforcePBC.py:23-45, applied inside the sampler as the reference
    intended, see its comment at :22).
    """
    logabs_f = select_output(f, 1)

    def mc_step(params, data: AINetData, key: chex.PRNGKey):
        def step_fn(i, carry):
            data, key, _ = carry
            new_data, new_key, pmove = walkers_update(
                logabs_f, params, data, key, tstep=tstep, ndim=ndim,
                nelectrons=nelectrons, batch_size=batch_size, i=i)
            return new_data, new_key, pmove

        pmove0 = jnp.zeros(())
        new_data, _, pmove = lax.fori_loop(0, nsteps, step_fn, (data, key, pmove0))
        if lattice is not None:
            from aiqmc_tpu.pbc.enforce import enforce_pbc
            new_data = AINetData(**(dict(new_data) | {
                "positions": enforce_pbc(lattice, new_data.positions)}))
        return new_data, pmove

    return mc_step
