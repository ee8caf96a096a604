"""SPRING / MinSR stochastic-reconfiguration optimizer (beyond the reference).

The reference's optimizer zoo stops at Adam/KFAC (ref Optimizer/{adam,kfac}.py,
ferminet/train.py:742-811). SPRING (Goldshlager, Abrahamsen & Lin 2024,
building on MinSR, Chen & Heyl 2023; see also the "accelerated linear method"
line in PAPERS.md) is the current state of the art for neural-network VMC at
small-to-medium parameter counts, and is unusually TPU-friendly: the natural-
gradient solve happens in SAMPLE space via the push-through identity

    (O^T O + lam I)^{-1} O^T = O^T (O O^T + lam I)^{-1},

so the per-step dense work is one (B x P) jacobian, one (B x B) = O O^T MXU
matmul, and one Cholesky solve of a B x B system — no P x P curvature ever
exists (P = parameters, B = walkers).

Per step, with Obar = (O - mean O)/sqrt(B) the centered, normalised per-sample
jacobian of log|psi| and eps = -(E_L - mean E_L)/sqrt(B) the (optionally
TV-clipped) residual:

    delta_t = mu * delta_{t-1}
              + Obar^T (Obar Obar^T + lam I)^{-1} (eps - mu * Obar delta_{t-1})
    theta  += lr(t) * delta_t

mu=0 recovers plain MinSR; the mu-coupled previous direction is SPRING's
iterate-reuse, which stabilises the small-lam regime. Real wavefunctions and
the TPU-safe complex-pair representation are supported (pair mode solves the
complex MinSR normal equations exactly, in real arithmetic on the stacked
[d log|psi|; d phase] jacobian — see make_spring_optimizer).

TPU precision note: every matmul touching O runs at Precision.HIGHEST. The
default TPU matmul truncates f32 inputs to bf16 (~1e-2 relative error on the
Gram entries), which swamps the lam ~ 1e-3 damping: the Cholesky solve then
returns directions that look Fisher-bounded in bf16 but are near O's true
null space and enormous in parameter space — observed on-chip as finite,
non-variational divergence with pmove collapse (runs/c_spring_big) while the
identical step is stable on CPU (f32 throughout).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import chex
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from aiqmc_tpu.loss import AuxiliaryLossData, _mask_nonfinite, clip_local_values
from aiqmc_tpu.models.network import AINetData, ParamTree


@dataclasses.dataclass
class SpringOptions:
    damping: float = 1e-3           # lam: regulariser of the B x B solve
    mu: float = 0.99                # previous-direction coupling (SPRING)
    clip_local_energy: float = 5.0  # TV clip on the residual (0 = off)
    norm_constraint: float = 1e-3   # lr^2 |delta|_F^2 <= c, as in KFAC
    learning_rate_schedule: Callable[[Any], Any] = (
        lambda t: 2e-2 / (1 + t / 4000.0))


@chex.dataclass
class SpringState:
    t: jnp.ndarray            # step counter
    prev_delta: jnp.ndarray   # (P,) previous update direction (flat)


def make_spring_optimizer(logabs_network,
                          local_energy,
                          params_template: ParamTree,
                          options: SpringOptions,
                          pair_output: bool = False,
                          signed_network=None):
    """Builds (init, step) with step(params, state, key, data) ->
    (params, state, loss, aux) — drop-in for the KFAC step in the trainer.

    Args:
      logabs_network: REAL log|psi| (params, pos, spins, atoms, charges).
      local_energy: single-walker e_l(params, key, data) -> (E_L, aux).
      params_template: params pytree (sizes the flat direction vector).
      options: hyperparameters.
      pair_output: complex wavefunction in the TPU-safe (re, im) pair
        representation. Complex MinSR/SPRING reduces EXACTLY to the real
        solve on the stacked (2B, P) jacobian [d log|psi|; d phase] with the
        stacked residual [-Re diff; -Im diff]: every inner product in the
        normal equations is the real part of the complex one, so the solve,
        the energy-gradient identity 2 Re E[conj(O)(E_L - E)] and the
        quantum-metric trust region all come out right in real arithmetic.
        Requires ``signed_network`` (phase, log|psi|).
      signed_network: (params, ...) -> (phase, log|psi|), pair mode only.
    """
    if pair_output and signed_network is None:
        raise ValueError("pair_output SPRING needs signed_network")
    flat0, unravel = ravel_pytree(params_template)
    nparams = flat0.size

    batch_local_energy = jax.vmap(
        local_energy,
        in_axes=(None, 0, AINetData(positions=0, spins=None, atoms=None,
                                    charges=None)),
        out_axes=(0, 0))

    def init(params: ParamTree) -> SpringState:
        del params
        return SpringState(t=jnp.zeros((), jnp.int32),
                           prev_delta=jnp.zeros((nparams,), flat0.dtype))

    def step(params: ParamTree, state: SpringState, key: chex.PRNGKey,
             data: AINetData):
        batch = data.positions.shape[0]
        keys = jax.random.split(key, num=batch)
        e_l, _ = batch_local_energy(params, keys, data)
        e_l = _mask_nonfinite(e_l)  # singular walkers contribute zero residual
        if pair_output:
            loss_pair = jnp.mean(e_l, axis=0)            # (2,) [Re, Im]
            loss = loss_pair[0]
            variance = jnp.mean(
                jnp.sum((e_l - loss_pair[None]) ** 2, axis=-1))
            if options.clip_local_energy > 0.0:
                _, diff = clip_local_values(
                    e_l, loss_pair, options.clip_local_energy,
                    clip_from_median=True, center_at_clipped_value=True,
                    pair_output=True)
            else:
                diff = e_l - loss_pair[None]
        else:
            loss = jnp.mean(e_l)
            variance = jnp.mean((e_l - loss) ** 2)
            if options.clip_local_energy > 0.0:
                _, diff = clip_local_values(
                    e_l, loss, options.clip_local_energy,
                    clip_from_median=True, center_at_clipped_value=True)
            else:
                diff = e_l - loss

        flat_params = ravel_pytree(params)[0]
        sqrt_b = jnp.sqrt(jnp.asarray(batch, flat_params.dtype))
        # A walker at a singular configuration (node, coalescence) has a
        # non-finite score row; one such row NaNs the whole solve (observed
        # on-chip: runs/c_spring collapsed at iter 1623). Make the walker
        # INERT: exclude it from the centering mean, zero its centered row
        # AND its residual entry, so its t_mat row/col is exactly lam*e_i
        # with rhs_i = 0 -> x_i = 0 and it contributes nothing to delta,
        # independent of the singular walker's content.
        if pair_output:
            # Stacked (2B, P) real form of complex MinSR (see docstring):
            # rows are [d log|psi|] then [d phase], residuals [-Re, -Im].
            def flat_sig(fp, pos):
                phase, mag = signed_network(unravel(fp), pos, data.spins,
                                            data.atoms, data.charges)
                return jnp.stack([mag, phase])

            o2 = jax.vmap(jax.jacrev(flat_sig, argnums=0),
                          in_axes=(None, 0))(flat_params, data.positions)
            ok_w = jnp.all(jnp.isfinite(o2), axis=(1, 2))      # (B,)
            o2 = jnp.where(ok_w[:, None, None], o2, 0.0)
            n_ok = jnp.maximum(jnp.sum(ok_w.astype(o2.dtype)), 1.0)
            mean2 = jnp.sum(o2, axis=0, keepdims=True) / n_ok
            o2 = jnp.where(ok_w[:, None, None], o2 - mean2, 0.0) / sqrt_b
            o = jnp.concatenate([o2[:, 0, :], o2[:, 1, :]], axis=0)
            eps = jnp.concatenate([jnp.where(ok_w, -diff[:, 0], 0.0),
                                   jnp.where(ok_w, -diff[:, 1], 0.0)]) / sqrt_b
        else:
            # Per-sample flat jacobian of log|psi| (the B x P matrix O).
            def flat_logpsi(fp, pos):
                return logabs_network(unravel(fp), pos, data.spins,
                                      data.atoms, data.charges)

            o = jax.vmap(jax.grad(flat_logpsi, argnums=0),
                         in_axes=(None, 0))(flat_params, data.positions)
            row_ok = jnp.all(jnp.isfinite(o), axis=1, keepdims=True)
            o = jnp.where(row_ok, o, 0.0)
            n_ok = jnp.maximum(jnp.sum(row_ok.astype(o.dtype)), 1.0)
            o_mean = jnp.sum(o, axis=0, keepdims=True) / n_ok
            o = jnp.where(row_ok, o - o_mean, 0.0) / sqrt_b
            eps = jnp.where(row_ok[:, 0], -diff, 0.0) / sqrt_b

        # Sample-space solve: (O O^T + lam I) x = eps - mu O delta_prev.
        # HIGHEST precision is load-bearing on TPU (see module docstring).
        hi = jax.lax.Precision.HIGHEST
        t_mat = (jnp.matmul(o, o.T, precision=hi)
                 + options.damping * jnp.eye(o.shape[0], dtype=o.dtype))
        rhs = eps - options.mu * jnp.matmul(o, state.prev_delta, precision=hi)
        chol = jax.scipy.linalg.cho_factor(t_mat)
        x = jax.scipy.linalg.cho_solve(chol, rhs)
        delta = (options.mu * state.prev_delta
                 + jnp.matmul(o.T, x, precision=hi))

        # Fisher-norm trust region, as in optim/kfac.py: the Fisher quadratic
        # form of delta is 4 |Obar delta|^2 (log-density score = 2 o).
        lr = options.learning_rate_schedule(state.t)
        sq_fisher = 4.0 * jnp.sum(
            jnp.matmul(o, delta, precision=hi) ** 2)
        coeff = jnp.minimum(
            1.0, jnp.sqrt(options.norm_constraint / jnp.maximum(
                lr * lr * sq_fisher, 1e-30)))
        scaled = lr * coeff * delta

        # Finite-step rollback (same contract as optim/adam.py): a failed
        # Cholesky or residual overflow must skip the step, not NaN params.
        ok = jnp.all(jnp.isfinite(scaled))
        new_flat = jnp.where(ok, flat_params + scaled, flat_params)
        new_params = unravel(new_flat)
        new_state = SpringState(
            t=state.t + 1,
            prev_delta=jnp.where(ok, coeff * delta,
                                 jnp.zeros_like(state.prev_delta)))
        aux = AuxiliaryLossData(variance=variance, local_energy=e_l,
                                clipped_energy=diff + loss,
                                grad_local_energy=None, local_energy_mat=None)
        return new_params, new_state, loss, aux

    return init, step
