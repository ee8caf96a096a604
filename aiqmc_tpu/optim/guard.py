"""Energy trust-region guard: statistical step rejection for VMC optimizers.

Motivation (measured, not hypothetical): heavy-atom all-electron runs can
diverge through a chain of *finite* but pathological optimizer steps — the
Si Z=14 run in `runs/si_vmc` was at -288.6 Ha (exact -289.36) at iteration
1500, then between iterations ~1806-1830 the batch variance exploded
150 -> 5000 Ha^2 while the batch energy plunged non-variationally to -700 Ha.
The existing non-finite rollback (optim/adam.py, optim/kfac.py — extending ref
AIQMCrelease3/Optimizer/adam.py:74-79) never fires because nothing is NaN.

This guard extends the reference's failure-detection story (SURVEY §5:
NaN guards are its only mechanism) with a statistical one: the step is
REJECTED — parameters and optimizer state keep their previous values; the
walkers keep their new positions, which is harmless since they were moved
under the previous parameters and remain samples of |psi_old|^2 — whenever,
after a warmup period,

  * the batch variance of E_L exceeds ``var_factor`` times its running
    exponentially-weighted mean (variance explosion), or
  * the batch energy jumps more than ``jump_sigmas`` standard errors
    (sqrt(ew_var / batch)) away from the running energy mean in a single
    step (non-variational plunge / blow-up).

Running statistics are updated only on accepted steps, so a runaway cannot
drag its own acceptance window along with it. Rejections are counted in the
guard state (surfaced in the per-step stats as ``guard_rejected``) so a
stalled run is visible in the training CSV rather than silently frozen.

Opt-in via ``cfg.optim.guard.enable`` — the defaults are calibrated loose
(var_factor 8, jump_sigmas 20) so that the routine 2-3x variance scatter of
an equilibrated run never triggers; see tests/test_guard.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GuardState(NamedTuple):
    ew_energy: jnp.ndarray   # EW mean of the batch energy (accepted steps)
    ew_var: jnp.ndarray      # EW mean of the batch E_L variance
    count: jnp.ndarray       # accepted-step count (drives warmup + EMA ramp)
    rejected: jnp.ndarray    # total rejected steps (diagnostic)


def init_state() -> GuardState:
    # Distinct buffers per field: the train loop donates the optimizer state,
    # and aliased leaves trip XLA's "donate the same buffer twice" check.
    return GuardState(ew_energy=jnp.zeros(()), ew_var=jnp.zeros(()),
                      count=jnp.zeros((), jnp.int32),
                      rejected=jnp.zeros((), jnp.int32))


def make_guarded_step(combined_step, *, var_factor: float = 8.0,
                      jump_sigmas: float = 20.0, warmup: int = 300,
                      decay: float = 0.98, var_ceiling: float = 0.0):
    """Wraps a ``combined_step(params, opt_state, data, key, width)`` whose
    opt_state is augmented to ``(inner_opt_state, GuardState)``.

    Returns (wrap_init, guarded_step). ``wrap_init`` lifts the inner
    ``opt_init`` so ``components.init(params)`` produces the augmented state
    (checkpoint save/restore then round-trips it like any other pytree).
    """

    def wrap_init(inner_init):
        def init(params):
            return (inner_init(params), init_state())
        return init

    def guarded_step(params, state, data, key, width):
        inner_state, g = state
        (new_params, new_inner, new_data, loss_val, stats,
         pmove) = combined_step(params, inner_state, data, key, width)

        loss_real = (loss_val.real if jnp.iscomplexobj(loss_val)
                     else loss_val)
        var = stats["variance"]
        var_real = var.real if jnp.iscomplexobj(var) else var
        batch = new_data.positions.shape[0]

        warmed = g.count >= warmup
        # Standard error of the batch-mean energy under the running variance.
        sem = jnp.sqrt(jnp.maximum(g.ew_var, 1e-12) / batch)
        var_bad = var_real > var_factor * jnp.maximum(g.ew_var, 1e-12)
        jump_bad = jnp.abs(loss_real - g.ew_energy) > jump_sigmas * sem
        finite = jnp.isfinite(loss_real) & jnp.isfinite(var_real)
        # Absolute variance ceiling (opt-in): the relative tests track their
        # own EW window, so GRADUAL corruption drags the window along and is
        # never rejected (measured: runs/c_spring_probe crept 0.02 -> 3 Ha^2
        # with only 8/700 rejections). A fixed ceiling — e.g. 10x the known
        # plateau variance for a continuation run — cannot be dragged.
        ceil_bad = (var_real > var_ceiling) if var_ceiling > 0.0 else False
        reject = warmed & (var_bad | jump_bad | ceil_bad | ~finite)

        out_params = jax.lax.cond(reject, lambda: params, lambda: new_params)
        out_inner = jax.lax.cond(reject, lambda: inner_state,
                                 lambda: new_inner)

        # Bias-corrected EMA: behaves like a plain mean over the first
        # 1/(1-decay) steps, so the warmup threshold sees honest statistics.
        upd = ~reject & finite
        n = jnp.minimum(g.count + 1, jnp.int32(round(1.0 / (1.0 - decay))))
        frac = jnp.where(upd, 1.0 / jnp.maximum(n, 1).astype(loss_real.dtype),
                         0.0)
        new_g = GuardState(
            ew_energy=g.ew_energy * (1 - frac) + loss_real * frac,
            ew_var=g.ew_var * (1 - frac) + var_real * frac,
            count=g.count + jnp.where(upd, 1, 0).astype(jnp.int32),
            rejected=g.rejected + jnp.where(reject, 1, 0).astype(jnp.int32))

        stats = dict(stats)
        stats["guard_rejected"] = new_g.rejected
        return (out_params, (out_inner, new_g), new_data, loss_val, stats,
                pmove)

    return wrap_init, guarded_step
