"""Native KFAC optimizer for the QMC energy loss.

The reference optimises with kfac_jax, registering its layers through jaxpr
graph-pattern matching (ref AIQMCrelease3/curvature_tags_and_blocks.py:194-263,
Optimizer/kfac.py:45-81). kfac_jax is not available in this environment, and
jaxpr pattern-matching is fragile under GSPMD, so this is a from-scratch KFAC
tailored to the model family we own:

  * Every dense layer runs through ``models.blocks.linear_layer`` on
    (repeats, features) activations — exactly the situation kfac_jax's
    RepeatedDenseBlock handles (vmapped dense layer with the curvature rescaled
    by the repeat count; ref curvature_tags_and_blocks.py:30-58).
  * Per-sample pre-activation cotangents g come from a probe trick: each dense
    layer's bias is offset by a zero probe of the output shape; d log|psi| /
    d probe IS g. Activations a are recorded by an activation tape inside
    ``linear_layer`` (models/blocks.py) and matched to layers by weight-leaf
    identity. One vmapped value-and-grad per update yields every (a, g).
  * Kronecker factors with the bias folded into A via homogeneous coordinates:
        A_l = E_{batch, repeats}[a_aug a_aug^T],   G_l = R_l * E[g g^T]
    EMA-accumulated and damped with pi-splitting
    (pi = sqrt((tr(A)/dim_A)/(tr(G)/dim_G))), inverted with linear solves.
  * Parameters outside dense layers (grouped-reduce weights, envelope, Jastrow,
    normalised Y-coefficients) are "generic" blocks preconditioned by identity,
    as kfac_jax treats unmatched parameters.
  * Updates respect the Fisher-norm constraint
    lr^2 * grad^T F^{-1} grad <= norm_constraint (kfac_jax norm_constraint).

Distribution: all factor and gradient reductions are global-batch means, so
GSPMD lowers them to the same ICI psums the reference obtained through
kfac_jax's pmap axis plumbing (ref ferminet/train.py:773).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Tuple

import chex
import jax
import jax.numpy as jnp

from aiqmc_tpu.models import blocks
from aiqmc_tpu.models.network import AINetData, ParamTree


# ---------------------------------------------------------------------------
# Dense-layer discovery and pytree path utilities.
# ---------------------------------------------------------------------------

def dense_layer_paths(params: ParamTree) -> List[Tuple]:
    """Paths of every {'w': (in,out), 'b': (out,)} dense layer in the tree.

    Only layers with a 1-D bias participate (the grouped-reduce layers carry a
    2-D bias and multiply elementwise; the Y-coefficient layer has no bias and
    is used row-normalised — both are handled as generic blocks).
    """
    paths = []

    def visit(path, node):
        if isinstance(node, dict):
            w = node.get("w")
            b = node.get("b")
            if (w is not None and getattr(w, "ndim", 0) == 2
                    and b is not None and getattr(b, "ndim", 0) == 1):
                paths.append(tuple(path))
                return
            for k, v in node.items():
                visit(path + [k], v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                visit(path + [i], v)

    visit([], params)
    return paths


def _get_path(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set_path(tree, path, value):
    if not path:
        return value
    head, rest = path[0], path[1:]
    if isinstance(tree, dict):
        new = dict(tree)
        new[head] = _set_path(tree[head], rest, value)
        return new
    if isinstance(tree, (list, tuple)):
        new = list(tree)
        new[head] = _set_path(tree[head], rest, value)
        return type(tree)(new) if isinstance(tree, tuple) else new
    raise TypeError(f"Cannot descend into {type(tree)}")


# ---------------------------------------------------------------------------
# Options / state.
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class KfacOptions:
    damping: float = 1e-3
    cov_ema_decay: float = 0.95
    norm_constraint: float = 1e-3
    min_damping: float = 1e-4
    max_damping: float = jnp.inf
    momentum: float = 0.0
    learning_rate_schedule: Callable[[Any], Any] = lambda t: 5e-2 / (1 + t / 1e4)
    update_period: int = 1  # recompute Kronecker factors every k steps
    # Quadratic-model step sizing (kfac_jax use_adaptive_learning_rate /
    # use_adaptive_momentum): pick (alpha, mu) minimising the local quadratic
    # model g'd + d'Cd/2 over span{preconditioned grad, previous velocity},
    # with C = F + lambda*I and F applied EXACTLY on the batch via per-sample
    # tangents of log|psi| (one extra vmapped JVP; no factorised approximation).
    adaptive_learning_rate: bool = False
    # Levenberg-Marquardt damping adaptation (kfac_jax use_adaptive_damping):
    # every `damping_adaptation_interval` steps compare the realised loss drop
    # with the quadratic-model prediction (reduction ratio rho) and scale
    # damping down when the model is trustworthy (rho > 0.75), up when not
    # (rho < 0.25). Costs one extra loss evaluation on those steps.
    adaptive_damping: bool = False
    damping_adaptation_interval: int = 5
    damping_adaptation_decay: float = 0.9


@chex.dataclass
class KfacState:
    step: Any
    velocities: Any
    factors_a: Any
    factors_g: Any
    damping: Any


def make_kfac_optimizer(evaluate_loss,
                        loss_network,
                        params_template: ParamTree,
                        options: KfacOptions,
                        data_template: AINetData):
    """Builds (init, step) where step(params, state, key, data) ->
    (params, state, loss, aux) — drop-in for the Adam step in the trainer.

    Args:
      evaluate_loss: total_energy(params, key, data) with the custom-JVP energy
        gradient (aiqmc_tpu.loss.make_loss).
      loss_network: single-config REAL log|psi| (params, pos, spins, atoms,
        charges) -> scalar, used for curvature only (the sampling density is
        |psi|^2 = exp(2 log|psi|), so the Fisher involves only the magnitude).
      params_template: params pytree (for layer discovery / probe shapes).
      options: hyperparameters.
      data_template: an AINetData with representative (unbatched-system,
        batched-positions) shapes, used to trace probe shapes at build time.
    """
    paths = dense_layer_paths(params_template)
    loss_and_grad = jax.value_and_grad(evaluate_loss, argnums=0, has_aux=True)

    # ---- Trace the dense-call structure once to size the probes. ------------
    # Layers may fire SEVERAL times per evaluation (RepeatedDense semantics;
    # e.g. the shared excited-state ansatz evaluates the base network once per
    # state configuration), so probes and activations are tracked per CALL in
    # tape order and grouped by layer path when the Kronecker factors are
    # assembled. `call_paths[i]` is the index into `paths` of tape call i
    # (None for untracked matmuls); it is static — filled as a side effect of
    # the single eval_shape trace below.
    call_paths = []

    def _shapes_only(pos):
        with blocks.capture_activations() as tape:
            loss_network(params_template, pos, data_template.spins,
                         data_template.atoms, data_template.charges)
        call_paths.clear()
        acts = []
        for (x, w) in tape:
            match = None
            for pi, path in enumerate(paths):
                if w is _get_path(params_template, path)["w"]:
                    match = pi
                    break
            call_paths.append(match)
            if match is not None:
                acts.append(x)
        seen = {pi for pi in call_paths if pi is not None}
        for pi, path in enumerate(paths):
            if pi not in seen:
                raise ValueError(f"No activation recorded for layer {path}")
        return acts

    # Abstract shape trace only — nothing is executed.
    _acts_shapes = jax.eval_shape(
        _shapes_only,
        jax.ShapeDtypeStruct(data_template.positions.shape[1:],
                             data_template.positions.dtype))
    tracked = [pi for pi in call_paths if pi is not None]
    probe_shapes = []
    for pi, a_shape in zip(tracked, _acts_shapes):
        w = _get_path(params_template, paths[pi])["w"]
        probe_shapes.append((a_shape.shape[0], w.shape[1]))

    zero_probes = [jnp.zeros(s) for s in probe_shapes]

    # ---- Per-sample (a, g) capture. -----------------------------------------
    def _sample_ag(params, pos, spins, atoms, charges):
        def f(probes):
            # Scatter the tracked probes into call-order slots; each dense
            # CALL gets its own output perturbation (blocks.linear_layer),
            # so grad wrt probes = per-call output gradients even when one
            # layer fires several times.
            it = iter(probes)
            full = [next(it) if pi is not None else None for pi in call_paths]
            with blocks.capture_activations(probes=full) as tape:
                out = loss_network(params, pos, spins, atoms, charges)
            acts = [x for (x, _), pi in zip(tape, call_paths)
                    if pi is not None]
            return out, acts

        grads, acts = jax.grad(f, has_aux=True)(zero_probes)
        return acts, grads

    def _batch_factors(params, data):
        """Batch-mean Kronecker factors A (with bias fold) and G."""
        acts, grads = jax.vmap(
            _sample_ag, in_axes=(None, 0, None, None, None))(
                params, data.positions, data.spins, data.atoms, data.charges)
        new_a, new_g = [], []
        for pi in range(len(paths)):
            idxs = [ci for ci, p in enumerate(tracked) if p == pi]
            # Calls of one layer concatenate along the repeats (row) axis:
            # a: (B, sum_R, din); g: (B, sum_R, dout).
            a = jnp.concatenate([acts[ci] for ci in idxs], axis=1)
            g = jnp.concatenate([grads[ci] for ci in idxs], axis=1)
            repeats = a.shape[1]
            ones = jnp.ones(a.shape[:-1] + (1,), a.dtype)
            a_aug = jnp.concatenate([a, ones], axis=-1)
            a2 = a_aug.reshape(-1, a_aug.shape[-1])
            g2 = g.reshape(-1, g.shape[-1])
            A = (a2.T @ a2) / a2.shape[0]
            G = (g2.T @ g2) / g2.shape[0] * repeats
            new_a.append(A)
            new_g.append(G)
        return new_a, new_g

    # ---- Optimizer API. ------------------------------------------------------
    def init(params: ParamTree) -> KfacState:
        factors_a = [jnp.eye(_get_path(params, p)["w"].shape[0] + 1)
                     for p in paths]
        factors_g = [jnp.eye(_get_path(params, p)["w"].shape[1]) for p in paths]
        velocities = jax.tree_util.tree_map(jnp.zeros_like, params)
        return KfacState(step=jnp.zeros((), jnp.int32), velocities=velocities,
                         factors_a=factors_a, factors_g=factors_g,
                         damping=jnp.asarray(options.damping))

    def _batch_tangent(params, direction, data):
        """Per-sample J@direction of log|psi| — exact Fisher-vector pieces.

        x^T F y on the batch is mean(t_x * t_y) with t = J@x, avoiding the
        Kronecker approximation when sizing steps (kfac_jax's exact quadratic
        model uses the same curvature-matrix-vector products)."""
        def tang(pos):
            f = lambda p: loss_network(p, pos, data.spins, data.atoms,
                                       data.charges)
            _, t = jax.jvp(f, (params,), (direction,))
            return t
        return jax.vmap(tang)(data.positions)

    def _tree_vdot(x, y):
        s = jax.tree_util.tree_map(lambda a, b: jnp.sum(a * b), x, y)
        return jax.tree_util.tree_reduce(lambda a, b: a + b, s)

    def step(params: ParamTree, state: KfacState, key: chex.PRNGKey,
             data: AINetData):
        (loss_val, aux), grads = loss_and_grad(params, key, data)
        decay = options.cov_ema_decay

        def _refreshed_factors():
            batch_a, batch_g = _batch_factors(params, data)
            return ([decay * fa + (1 - decay) * na
                     for fa, na in zip(state.factors_a, batch_a)],
                    [decay * fg + (1 - decay) * ng
                     for fg, ng in zip(state.factors_g, batch_g)])

        if options.update_period <= 1:
            factors_a, factors_g = _refreshed_factors()
        else:
            # Factor-update amortisation (kfac_jax cov_update_every): the
            # probe-gradient factor pass is skipped between refresh steps.
            factors_a, factors_g = jax.lax.cond(
                state.step % options.update_period == 0,
                _refreshed_factors,
                lambda: (list(state.factors_a), list(state.factors_g)))

        # Precondition dense-layer gradients: V = A^-1 [gW; gb] G^-1.
        precon = grads
        sq_fisher_norm = jnp.zeros(())
        for path, A, G in zip(paths, factors_a, factors_g):
            layer_grad = _get_path(grads, path)
            gw, gb = layer_grad["w"], layer_grad["b"]
            stacked = jnp.concatenate([gw, gb[None, :]], axis=0)  # (din+1, dout)
            da, dg = A.shape[0], G.shape[0]
            pi = jnp.sqrt((jnp.trace(A) / da) / (jnp.trace(G) / dg) + 1e-30)
            lam = jnp.clip(state.damping, options.min_damping,
                           options.max_damping)
            A_d = A + jnp.sqrt(lam) * pi * jnp.eye(da)
            G_d = G + jnp.sqrt(lam) / pi * jnp.eye(dg)
            v = jax.scipy.linalg.solve(A_d, stacked, assume_a="pos")
            v = jax.scipy.linalg.solve(G_d, v.T, assume_a="pos").T
            sq_fisher_norm += jnp.sum(stacked * v)
            precon = _set_path(precon, path,
                               {"w": v[:-1, :], "b": v[-1, :]})
        # Generic blocks: identity preconditioner; their Fisher-norm term is the
        # plain gradient norm (dense params were counted via <grad, precon>).
        flat_grads, _ = jax.tree_util.tree_flatten(grads)
        dense_leaves = set()
        for path in paths:
            layer = _get_path(grads, path)
            dense_leaves.add(id(layer["w"]))
            dense_leaves.add(id(layer["b"]))
        for leaf in flat_grads:
            if id(leaf) not in dense_leaves:
                sq_fisher_norm += jnp.sum(leaf * leaf)

        lam = jnp.clip(state.damping, options.min_damping, options.max_damping)
        loss_real = (loss_val.real if jnp.iscomplexobj(loss_val) else loss_val)

        if options.adaptive_learning_rate:
            # Exact quadratic model over span{precond grad d, velocity p}:
            # minimise g'delta + delta'(F + lam I)delta / 2 for
            # delta = a*d + b*p, with F applied exactly on the batch.
            d, p = precon, state.velocities
            t_d = _batch_tangent(params, d, data)
            t_p = _batch_tangent(params, p, data)
            dd, dp_, pp = (_tree_vdot(d, d), _tree_vdot(d, p),
                           _tree_vdot(p, p))
            c_dd = jnp.mean(t_d * t_d) + lam * dd
            c_dp = jnp.mean(t_d * t_p) + lam * dp_
            c_pp = jnp.mean(t_p * t_p) + lam * pp
            g_d = _tree_vdot(grads, d).real
            g_p = _tree_vdot(grads, p).real
            M = jnp.array([[c_dd, c_dp], [c_dp, c_pp]])
            ridge = 1e-7 * jnp.maximum(c_dd, c_pp) + 1e-30
            coeffs = jnp.linalg.solve(M + ridge * jnp.eye(2),
                                      -jnp.array([g_d, g_p]))
            a_c, b_c = coeffs[0], coeffs[1]
            delta = jax.tree_util.tree_map(
                lambda dx, px: a_c * dx + b_c * px, d, p)
            velocities = delta
            t_delta = a_c * t_d + b_c * t_p
            quad_model = (a_c * g_d + b_c * g_p
                          + 0.5 * (jnp.mean(t_delta * t_delta)
                                   + lam * _tree_vdot(delta, delta)))
        else:
            lr = options.learning_rate_schedule(state.step)
            scale = jnp.minimum(
                1.0, jnp.sqrt(options.norm_constraint /
                              (lr * lr * sq_fisher_norm + 1e-30)))
            velocities = jax.tree_util.tree_map(
                lambda v, g: options.momentum * v + scale * g,
                state.velocities, precon)
            delta = jax.tree_util.tree_map(lambda v: -lr * v, velocities)
            quad_model = None

        new_params = jax.tree_util.tree_map(
            lambda p_, dx: p_ + dx, params, delta)

        damping = state.damping
        if options.adaptive_damping:
            # Levenberg-Marquardt reduction ratio rho = actual/predicted loss
            # change on the same batch & key (kfac_jax use_adaptive_damping).
            if quad_model is None:
                t_delta = _batch_tangent(params, delta, data)
                quad_model = (_tree_vdot(grads, delta).real
                              + 0.5 * (jnp.mean(t_delta * t_delta)
                                       + lam * _tree_vdot(delta, delta)))

            def _adapt(damp):
                new_loss, _ = evaluate_loss(new_params, key, data)
                new_real = (new_loss.real if jnp.iscomplexobj(new_loss)
                            else new_loss)
                rho = (new_real - loss_real) / (quad_model - 1e-30)
                dec = (options.damping_adaptation_decay
                       ** options.damping_adaptation_interval)
                damp = jnp.where(rho > 0.75, damp * dec,
                                 jnp.where(rho < 0.25, damp / dec, damp))
                return jnp.clip(damp, options.min_damping, options.max_damping)

            damping = jax.lax.cond(
                state.step % options.damping_adaptation_interval == 0,
                _adapt, lambda dmp: dmp, damping)

        # NaN guard (ref Optimizer/kfac.py:63-79 reset_if_nan), extended to
        # non-finite updates/factors (a single spiking walker must not corrupt
        # parameters or the factor EMAs).
        from aiqmc_tpu.optim.adam import tree_all_finite
        ok = (jnp.isfinite(loss_real) & tree_all_finite(velocities)
              & tree_all_finite(factors_a) & tree_all_finite(factors_g))
        new_params = jax.lax.cond(ok, lambda: new_params, lambda: params)
        velocities = jax.lax.cond(ok, lambda: velocities,
                                  lambda: state.velocities)
        factors_a = jax.lax.cond(ok, lambda: factors_a,
                                 lambda: state.factors_a)
        factors_g = jax.lax.cond(ok, lambda: factors_g,
                                 lambda: state.factors_g)
        damping = jnp.where(ok & jnp.isfinite(damping), damping, state.damping)
        new_state = KfacState(step=state.step + 1, velocities=velocities,
                              factors_a=factors_a, factors_g=factors_g,
                              damping=damping)
        return new_params, new_state, loss_val, aux

    return init, step
