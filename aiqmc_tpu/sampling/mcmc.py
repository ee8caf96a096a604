"""All-electron random-walk Metropolis sampler with adaptive width.

Capability parity with the vendored upstream sampler (ref ferminet/mcmc.py:78-148,
221-327): symmetric Gaussian proposals moving all electrons at once, one network
evaluation per step, and a host-side adaptive proposal width targeting an
acceptance ratio around 0.525. This is the cheap default for VMC equilibration;
the drift-diffusion sampler (sampling/drift_diffusion.py) matches the reference
AIQMC proposal machinery.
"""

from __future__ import annotations

from typing import Tuple

import chex
import jax
import jax.numpy as jnp
from jax import lax

from aiqmc_tpu.models.network import AINetData


def mh_update(logprob_fn, x1, lp1, key, width) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One symmetric random-walk MH update of all walkers."""
    key, proposal_key, accept_key = jax.random.split(key, num=3)
    x2 = x1 + width * jax.random.normal(proposal_key, shape=x1.shape)
    lp2 = logprob_fn(x2)
    ratio = lp2 - lp1
    rnd = jnp.log(jax.random.uniform(accept_key, shape=lp1.shape))
    # Force-accept finite proposals from non-finite (stuck) states.
    cond = (ratio > rnd) | (~jnp.isfinite(lp1) & jnp.isfinite(lp2))
    x_new = jnp.where(cond[:, None], x2, x1)
    lp_new = jnp.where(cond, lp2, lp1)
    return x_new, lp_new, jnp.mean(cond.astype(x1.dtype))


def make_mcmc_step(batch_network, batch_per_device: int, steps: int = 10,
                   lattice=None, blocks: int = 1, nelectrons: int = None,
                   ndim: int = 3):
    """Builds mcmc_step(params, data, key, width) -> (new_data, pmove).

    blocks > 1 splits the electrons into that many groups and proposes each
    group's move separately within a step (ref ferminet/mcmc.py:151-218
    mh_block_update) — cheaper mixing for large electron counts."""
    del batch_per_device
    if blocks > 1 and nelectrons is None:
        raise ValueError("blocks > 1 requires nelectrons")
    if blocks > 1:
        import numpy as np
        masks = []
        bounds = np.linspace(0, nelectrons, blocks + 1).astype(int)
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            m = np.zeros((nelectrons, ndim))
            m[lo:hi] = 1.0
            masks.append(jnp.asarray(m.reshape(-1)))

    def mcmc_step(params, data: AINetData, key: chex.PRNGKey, width):
        def logprob(x):
            return 2.0 * batch_network(params, x, data.spins, data.atoms,
                                       data.charges)

        lp0 = logprob(data.positions)

        def body(i, carry):
            x, lp, key, acc = carry
            if blocks > 1:
                pmove = jnp.zeros(())
                for mask in masks:
                    key, subkey = jax.random.split(key)
                    pk, ak = jax.random.split(subkey)
                    x2 = x + width * mask[None] * jax.random.normal(
                        pk, shape=x.shape)
                    lp2 = logprob(x2)
                    cond = ((lp2 - lp >
                             jnp.log(jax.random.uniform(ak, shape=lp.shape)))
                            | (~jnp.isfinite(lp) & jnp.isfinite(lp2)))
                    x = jnp.where(cond[:, None], x2, x)
                    lp = jnp.where(cond, lp2, lp)
                    pmove += jnp.mean(cond.astype(x.dtype)) / blocks
            else:
                key, subkey = jax.random.split(key)
                x, lp, pmove = mh_update(logprob, x, lp, subkey, width)
            return x, lp, key, acc + pmove

        x, _, _, acc = lax.fori_loop(
            0, steps, body, (data.positions, lp0, key, jnp.zeros(())))
        if lattice is not None:
            from aiqmc_tpu.pbc.enforce import enforce_pbc
            x = enforce_pbc(lattice, x)
        new_data = AINetData(**(dict(data) | {"positions": x}))
        return new_data, acc / steps

    return mcmc_step


def update_mcmc_width(t: int, width: float, adapt_frequency: int, pmove: float,
                      pmoves, pmove_max: float = 0.55,
                      pmove_min: float = 0.5):
    """Host-side adaptive proposal width (ref ferminet/mcmc.py:293-327)."""
    t_since_mcmc_update = t % adapt_frequency
    if t > 0 and t_since_mcmc_update == 0:
        if pmoves.mean() > pmove_max:
            width *= 1.1
        elif pmoves.mean() < pmove_min:
            width /= 1.1
    pmoves[t_since_mcmc_update] = pmove
    return width, pmoves
