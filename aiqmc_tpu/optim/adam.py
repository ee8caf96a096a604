"""Adam/optax training step (ref AIQMCrelease3/Optimizer/adam.py).

TPU redesign: the step is a plain function meant to be closed over by one global
``jax.jit`` (with donated walker/optimizer buffers) over the device mesh; the
gradient "pmean" of the reference (adam.py:56) is implicit — the loss is already a
global-batch mean, so its gradient is globally averaged by GSPMD.
"""

from __future__ import annotations

from typing import Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import optax

from aiqmc_tpu.loss import AuxiliaryLossData
from aiqmc_tpu.models.network import AINetData, ParamTree

OptUpdateResults = Tuple[ParamTree, Optional[optax.OptState], jnp.ndarray,
                         Optional[AuxiliaryLossData]]
StepResults = Tuple[AINetData, ParamTree, Optional[optax.OptState], jnp.ndarray,
                    AuxiliaryLossData]


def tree_all_finite(tree) -> jnp.ndarray:
    """True iff every leaf of the pytree is finite."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.asarray(True)
    return jnp.all(jnp.stack([jnp.all(jnp.isfinite(leaf)) for leaf in leaves]))


def make_opt_update_step(evaluate_loss, optimizer: optax.GradientTransformation):
    """loss+grad -> optax update (ref adam.py:49-59), with a finite-gradient
    flag.

    The reference guards only on NaN *loss* (ref adam.py:74-79); a non-finite
    gradient with a finite loss (a single near-singular walker spiking E_L
    through the custom JVP) would permanently corrupt the parameters on the
    next step. We surface a combined finiteness flag for the rollback.
    """
    loss_and_grad = jax.value_and_grad(evaluate_loss, argnums=0, has_aux=True)

    def opt_update(params: ParamTree, data: AINetData,
                   opt_state: Optional[optax.OptState],
                   key: chex.PRNGKey) -> OptUpdateResults:
        (loss, aux_data), grad = loss_and_grad(params, key, data)
        loss_real = loss.real if jnp.iscomplexobj(loss) else loss
        ok = jnp.isfinite(loss_real) & tree_all_finite(grad)
        updates, new_opt_state = optimizer.update(grad, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = jax.lax.cond(ok, lambda: new_params, lambda: params)
        new_opt_state = jax.lax.cond(ok, lambda: new_opt_state,
                                     lambda: opt_state)
        return new_params, new_opt_state, loss, aux_data

    return opt_update


def make_training_step(optimizer_step):
    """Wraps the optimizer update (rollback handled inside opt_update).

    Jit/pjit of this function is applied by the caller (train driver), which owns
    the mesh and donation policy.
    """

    def step(data: AINetData, params: ParamTree, state, key: chex.PRNGKey
             ) -> StepResults:
        _, loss_key = jax.random.split(key, num=2)
        new_params, new_state, loss, aux_data = optimizer_step(
            params, data, state, loss_key)
        return data, new_params, new_state, loss, aux_data

    return step
