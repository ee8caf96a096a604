"""DMC drift-diffusion propagation with fixed-node constraint.

Capability parity with ref ``AIQMCrelease3/DMC/drift_diffusion.py:25-106``: the
per-electron drift+diffusion proposal machinery plus a fixed-node kill (moves
whose wavefunction sign flips are rejected, ref drift_diffusion.py:87-89),
returning the acceptance damping factor and the limited drifts before/after the
move for the S-matrix weights.

Like the VMC sampler (aiqmc_tpu.sampling.drift_diffusion), electrons are updated
sequentially within the sweep so the kernel satisfies detailed balance (the
reference's simultaneous per-electron accepts do not); tdamp is the mean
acceptance probability (the reference's ratio of coordinate sums,
drift_diffusion.py:21, is not a probability).
"""

from __future__ import annotations

import chex
import jax
import jax.numpy as jnp
from jax import lax

from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.sampling.drift_diffusion import limdrift, limdrift_electron


def propose_drift_diffusion(signed_network,
                            tstep: float,
                            ndim: int,
                            nelectrons: int,
                            batch_size: int,
                            phase_kill: bool = True):
    """Returns drift_diffusion(params, key, data) ->
    (new_data, new_key, tdamp, v_old, v_new).

    phase_kill=False disables the fixed-node rejection for FIXED-PHASE DMC
    on smooth complex trials (complex-pairs networks: the phase varies
    continuously and its gradient is already a potential term in Re E_L, so
    rejecting phase changes would bias the walk). Keep True for real trials
    and twisted-real trials (genuine nodes)."""

    def drift_diffusion(params, key: chex.PRNGKey, data: AINetData):
        spins, atoms, charges = data.spins, data.atoms, data.charges

        # value_and_grad with has_aux needs (primary, aux); signed_network gives
        # (phase, mag) — we grad the magnitude and carry the phase as aux.
        def vag(x):
            def mag_fn(xx):
                phase, mag = signed_network(params, xx, spins, atoms, charges)
                return mag, phase

            (mag, phase), grad = jax.value_and_grad(mag_fn, has_aux=True)(x)
            return mag, phase, grad

        batch_vag = jax.vmap(vag)

        x0 = data.positions.reshape(batch_size, nelectrons, ndim)
        logpsi0, phase0, grad0 = batch_vag(data.positions)
        grad_flat0 = grad0
        grad0 = grad0.reshape(batch_size, nelectrons, ndim)
        v_old = limdrift(grad_flat0, tstep, 0.25, nelectrons, ndim)

        def electron_step(carry, e):
            x, logpsi, phase, grad, key = carry
            key, noise_key, accept_key = jax.random.split(key, num=3)
            ge = jnp.take(grad, e, axis=1)
            v = limdrift_electron(ge, tstep, 0.25)
            gauss = jnp.sqrt(tstep) * jax.random.normal(noise_key,
                                                        (batch_size, ndim))
            move = v * tstep + gauss
            onehot = jax.nn.one_hot(e, nelectrons, dtype=x.dtype)
            x_new = x + onehot[None, :, None] * move[:, None, :]

            logpsi2, phase2, grad2 = batch_vag(x_new.reshape(batch_size, -1))
            grad2 = grad2.reshape(batch_size, nelectrons, ndim)
            g2e = jnp.take(grad2, e, axis=1)
            v2 = limdrift_electron(g2e, tstep, 0.25)

            forward = jnp.sum(gauss ** 2, axis=-1)
            backward = jnp.sum((gauss + (v + v2) * tstep) ** 2, axis=-1)
            log_t = (forward - backward) / (2.0 * tstep)
            log_ratio = 2.0 * (logpsi2 - logpsi) + log_t
            acceptance = jnp.exp(jnp.minimum(log_ratio, 0.0))
            if phase_kill:
                # Fixed-node: kill node-crossing moves (sign/phase flip,
                # ref DMC/drift_diffusion.py:87-89).
                same_side = jnp.cos(phase2 - phase) > 0.0
                acceptance = acceptance * same_side.astype(acceptance.dtype)
            acceptance = jnp.where(jnp.isfinite(acceptance), acceptance, 0.0)
            rnd = jax.random.uniform(accept_key, shape=acceptance.shape)
            stuck = ~jnp.isfinite(logpsi) & jnp.isfinite(logpsi2)
            accept = (acceptance > rnd) | stuck

            x = jnp.where(accept[:, None, None], x_new, x)
            logpsi = jnp.where(accept, logpsi2, logpsi)
            phase = jnp.where(accept, phase2, phase)
            grad = jnp.where(accept[:, None, None], grad2, grad)
            return (x, logpsi, phase, grad, key), jnp.mean(acceptance)

        (x, _, _, grad, key), accs = lax.scan(
            electron_step, (x0, logpsi0, phase0, grad0, key),
            jnp.arange(nelectrons))
        tdamp = jnp.mean(accs)
        x_flat = x.reshape(batch_size, -1)
        new_data = AINetData(**(dict(data) | {"positions": x_flat}))
        v_new = limdrift(grad.reshape(batch_size, -1), tstep, 0.25,
                         nelectrons, ndim)
        return new_data, key, tdamp, v_old, v_new

    return drift_diffusion
