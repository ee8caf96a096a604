"""Native KFAC tests: layer discovery, factor correctness, training smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.models import blocks
from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.optim import kfac


def test_dense_layer_paths_discovery():
    params = {
        "layers": {
            "streams": [{
                "convolutional": {"w": jnp.ones((4, 8)), "b": jnp.ones((4, 2))},
                "single": {"w": jnp.ones((2, 3)), "b": jnp.ones((3,))},
            }],
            "streams_y": [{
                "single_Ynlm": {"w": jnp.ones((6, 4)), "b": jnp.ones((4,))},
            }],
        },
        "orbitals": [{"w": jnp.ones((3, 8)), "b": jnp.ones((8,))}],
        "y": [{"w": jnp.ones((4, 4))}],  # no bias: generic block
        "envelope": {"alpha": jnp.ones((4, 1))},
    }
    paths = kfac.dense_layer_paths(params)
    assert ("layers", "streams", 0, "single") in paths
    assert ("layers", "streams_y", 0, "single_Ynlm") in paths
    assert ("orbitals", 0) in paths
    # conv layer (2-D bias) and y layer (no bias) are excluded
    assert ("layers", "streams", 0, "convolutional") not in paths
    assert ("y", 0) not in paths


def _toy_setup():
    """One dense layer acting on (R=2, din=3) activations."""
    w = jnp.asarray(np.random.RandomState(0).normal(size=(3, 2)))
    b = jnp.asarray(np.random.RandomState(1).normal(size=(2,)))
    v = jnp.asarray(np.random.RandomState(2).normal(size=(2,)))
    params = {"layer": {"w": w, "b": b}, "out": {"v": v}}

    def loss_network(p, pos, spins, atoms, charges):
        del spins, atoms, charges
        x = pos.reshape(2, 3)
        h = jnp.tanh(blocks.linear_layer(x, **p["layer"]))  # (2, 2)
        return jnp.sum(h @ p["out"]["v"])

    return params, loss_network


def test_factor_shapes_and_values():
    params, loss_network = _toy_setup()
    batch = 8
    rng = np.random.RandomState(3)
    pos = jnp.asarray(rng.normal(size=(batch, 6)))
    data = AINetData(positions=pos, spins=jnp.ones((2,)),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))

    def evaluate_loss(p, key, d):
        vals = jax.vmap(lambda x: loss_network(p, x, None, None, None))(
            d.positions)
        from aiqmc_tpu.loss import AuxiliaryLossData
        return jnp.mean(vals), AuxiliaryLossData(
            variance=jnp.var(vals), local_energy=vals, clipped_energy=vals,
            grad_local_energy=None, local_energy_mat=None)

    options = kfac.KfacOptions(cov_ema_decay=0.0, damping=1e-3,
                               learning_rate_schedule=lambda t: 1e-2)
    init, step = kfac.make_kfac_optimizer(
        evaluate_loss, loss_network, params, options, data)
    state = init(params)
    new_params, new_state, loss, aux = step(params, state,
                                            jax.random.PRNGKey(0), data)

    # Expected factors: a = x rows (B*R, 3) augmented with ones; g = per-sample
    # d loss_network / d preactivation = (1 - h^2) * v.
    x = np.asarray(pos).reshape(batch * 2, 3)
    a_aug = np.concatenate([x, np.ones((batch * 2, 1))], axis=1)
    A_want = a_aug.T @ a_aug / (batch * 2)
    pre = x @ np.asarray(params["layer"]["w"]) + np.asarray(params["layer"]["b"])
    g = (1 - np.tanh(pre) ** 2) * np.asarray(params["out"]["v"])
    G_want = g.T @ g / (batch * 2) * 2  # repeat rescale R=2

    np.testing.assert_allclose(np.asarray(new_state.factors_a[0]), A_want,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.factors_g[0]), G_want,
                               rtol=1e-5)
    assert np.isfinite(float(loss))
    # Parameters must have moved.
    assert not np.allclose(np.asarray(new_params["layer"]["w"]),
                           np.asarray(params["layer"]["w"]))


def test_kfac_trains_h2():
    import ml_collections
    from aiqmc_tpu import config as config_lib, train

    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.array([[0.0, 0.0, -0.7], [0.0, 0.0, 0.7]])
        cfg.system.charges = np.array([1.0, 1.0])
        cfg.system.spins = np.array([1.0, -1.0])
        cfg.batch_size = 16
        cfg.optim.iterations = 2
        cfg.optim.optimizer = "kfac"
        cfg.mcmc.steps = 2
        cfg.mcmc.burn_in = 2
        cfg.network.hidden_dims = ((8, 4), (8, 4))
        cfg.network.hidden_dims_ynlm = (4, 4)
        cfg.debug.deterministic = True
        cfg.log.save_frequency = 1e9
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        with cfg.unlocked():
            cfg.log.save_path = tmp
        result = train.train(cfg)
    assert np.all(np.isfinite(result.energies))


def _toy_loss_pieces():
    params, loss_network = _toy_setup()
    batch = 8
    rng = np.random.RandomState(7)
    pos = jnp.asarray(rng.normal(size=(batch, 6)))
    data = AINetData(positions=pos, spins=jnp.ones((2,)),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))

    def evaluate_loss(p, key, d):
        vals = jax.vmap(lambda x: loss_network(p, x, None, None, None))(
            d.positions)
        from aiqmc_tpu.loss import AuxiliaryLossData
        return jnp.mean(vals), AuxiliaryLossData(
            variance=jnp.var(vals), local_energy=vals, clipped_energy=vals,
            grad_local_energy=None, local_energy_mat=None)

    return params, loss_network, evaluate_loss, data


def test_update_period_amortises_factor_refresh():
    params, loss_network, evaluate_loss, data = _toy_loss_pieces()
    options = kfac.KfacOptions(cov_ema_decay=0.0, damping=1e-3,
                               update_period=2,
                               learning_rate_schedule=lambda t: 1e-3)
    init, step = kfac.make_kfac_optimizer(
        evaluate_loss, loss_network, params, options, data)
    state = init(params)
    key = jax.random.PRNGKey(0)
    p1, s1, _, _ = step(params, state, key, data)      # t=0: refresh
    # G depends on params (A here is the params-independent input covariance).
    g_after_refresh = np.asarray(s1.factors_g[0])
    p2, s2, _, _ = step(p1, s1, key, data)             # t=1: hold
    np.testing.assert_array_equal(np.asarray(s2.factors_g[0]),
                                  g_after_refresh)
    _, s3, _, _ = step(p2, s2, key, data)              # t=2: refresh again
    assert not np.allclose(np.asarray(s3.factors_g[0]), g_after_refresh)


def test_adaptive_lr_minimises_quadratic_model_along_direction():
    """First step (velocity 0): delta must minimise g'x + x'Cx/2 on its line,
    with C = F + lam*I and F the exact per-sample outer-product Fisher."""
    params, loss_network, evaluate_loss, data = _toy_loss_pieces()
    lam = 1e-3
    options = kfac.KfacOptions(cov_ema_decay=0.0, damping=lam,
                               min_damping=lam, adaptive_learning_rate=True)
    init, step = kfac.make_kfac_optimizer(
        evaluate_loss, loss_network, params, options, data)
    state = init(params)
    new_params, _, _, _ = step(params, state, jax.random.PRNGKey(0), data)

    flat, unravel = jax.flatten_util.ravel_pytree(params)
    delta = np.asarray(
        jax.flatten_util.ravel_pytree(new_params)[0] - flat)

    # Exact per-sample Jacobian of loss_network -> Fisher.
    def f_flat(x, pos):
        return loss_network(unravel(x), pos, None, None, None)
    J = np.asarray(jax.vmap(jax.grad(f_flat), in_axes=(None, 0))(
        flat, data.positions))
    F = J.T @ J / J.shape[0]
    C = F + lam * np.eye(F.shape[0])
    g = np.asarray(jax.grad(
        lambda p: evaluate_loss(p, None, data)[0])(params))
    g = np.asarray(jax.flatten_util.ravel_pytree(
        jax.grad(lambda p: evaluate_loss(p, None, data)[0])(params))[0])

    def q(x):
        return g @ x + 0.5 * x @ C @ x

    q_star = q(delta)
    assert q_star < 0  # a descent step under the model
    for s in (0.0, 0.5, 0.9, 1.1, 2.0):
        assert q_star <= q(s * delta) + 1e-7 * abs(q_star)


def test_adaptive_damping_moves_within_bounds():
    params, loss_network, evaluate_loss, data = _toy_loss_pieces()
    options = kfac.KfacOptions(
        cov_ema_decay=0.0, damping=1e-2, min_damping=1e-6, max_damping=1e2,
        adaptive_learning_rate=True, adaptive_damping=True,
        damping_adaptation_interval=1, damping_adaptation_decay=0.5)
    init, step = kfac.make_kfac_optimizer(
        evaluate_loss, loss_network, params, options, data)
    state = init(params)
    key = jax.random.PRNGKey(0)
    dampings = [float(state.damping)]
    for _ in range(3):
        params, state, loss, _ = step(params, state, key, data)
        dampings.append(float(state.damping))
        assert np.isfinite(dampings[-1])
        assert 1e-6 <= dampings[-1] <= 1e2
    # The deterministic toy loss is well-modelled: damping must have adapted.
    assert dampings[-1] != dampings[0]
