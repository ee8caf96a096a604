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


def _harmonic_mean(x, atoms, ndim: int):
    """Per-electron harmonic mean of the distances to all nuclei.

    x: (batch, nelec*ndim) -> (batch, nelec). The harmonic mean is small near
    a nucleus and ~r far away, so scaling the proposal width by it gives core
    electrons short steps and valence electrons long ones (ref
    ferminet/mcmc.py:29-45) — the acceptance-rate equaliser that matters for
    heavy (large-Z) all-electron systems."""
    xe = jnp.reshape(x, (x.shape[0], -1, 1, ndim))
    r_ae = jnp.linalg.norm(xe - atoms[None, None], axis=-1)  # (b, ne, natom)
    return 1.0 / jnp.mean(1.0 / r_ae, axis=-1)


def _log_q_gaussian(x, mu, sigma, ndim: int):
    """log of the anisotropic proposal density q(x | mu, sigma) summed over
    electrons; sigma: (batch, nelec) per-electron isotropic widths."""
    d2 = jnp.sum(jnp.reshape(x - mu, (x.shape[0], -1, ndim)) ** 2, axis=-1)
    return jnp.sum(-0.5 * d2 / sigma ** 2 - ndim * jnp.log(sigma), axis=-1)


def mh_update_asymmetric(logprob_fn, x1, lp1, key, width, atoms, ndim=3):
    """One MH update with per-electron widths ~ N(0, (width * h_i)^2), h_i the
    harmonic-mean nuclear distance, and the detailed-balance correction
    lq(reverse) - lq(forward) in the acceptance ratio (ref
    ferminet/mcmc.py:118-148, cfg.mcmc.scale_by_nuclear_distance)."""
    key, proposal_key, accept_key = jax.random.split(key, num=3)
    h1 = _harmonic_mean(x1, atoms, ndim)              # (batch, nelec)
    sigma1 = width * h1
    eps = jax.random.normal(proposal_key, shape=(x1.shape[0],
                                                 h1.shape[1], ndim))
    x2 = x1 + jnp.reshape(sigma1[..., None] * eps, x1.shape)
    lp2 = logprob_fn(x2)
    sigma2 = width * _harmonic_mean(x2, atoms, ndim)
    lq_fwd = _log_q_gaussian(x2, x1, sigma1, ndim)
    lq_rev = _log_q_gaussian(x1, x2, sigma2, ndim)
    ratio = lp2 + lq_rev - lp1 - lq_fwd
    rnd = jnp.log(jax.random.uniform(accept_key, shape=lp1.shape))
    cond = (ratio > rnd) | (~jnp.isfinite(lp1) & jnp.isfinite(lp2))
    x_new = jnp.where(cond[:, None], x2, x1)
    lp_new = jnp.where(cond, lp2, lp1)
    return x_new, lp_new, jnp.mean(cond.astype(x1.dtype))


def make_mcmc_step(batch_network, batch_per_device: int, steps: int = 10,
                   lattice=None, blocks: int = 1, nelectrons: int = None,
                   ndim: int = 3, scale_by_nuclear_distance: bool = False):
    """Builds mcmc_step(params, data, key, width) -> (new_data, pmove).

    blocks > 1 splits the electrons into that many groups and proposes each
    group's move separately within a step (ref ferminet/mcmc.py:151-218
    mh_block_update) — cheaper mixing for large electron counts.

    scale_by_nuclear_distance: harmonic-mean-scaled asymmetric proposals
    (ref ferminet/mcmc.py:118-148); mutually exclusive with blocks > 1,
    matching the upstream (its block update is symmetric-only)."""
    del batch_per_device
    if blocks > 1 and nelectrons is None:
        raise ValueError("blocks > 1 requires nelectrons")
    if scale_by_nuclear_distance and blocks > 1:
        raise ValueError("scale_by_nuclear_distance requires blocks == 1")
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
            elif scale_by_nuclear_distance:
                key, subkey = jax.random.split(key)
                x, lp, pmove = mh_update_asymmetric(
                    logprob, x, lp, subkey, width, data.atoms, ndim)
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
