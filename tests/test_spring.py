"""SPRING/MinSR optimizer (optim/spring.py — beyond the reference's zoo)."""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import config as config_lib
from aiqmc_tpu import train as train_lib


def test_spring_large_damping_is_descent_direction():
    """In the large-damping limit SPRING reduces to plain gradient descent on
    the energy: the update must have positive overlap with -grad E."""
    from aiqmc_tpu.optim import spring as spring_lib
    from aiqmc_tpu.models.network import AINetData

    # Gaussian trial psi = exp(-a |r|^2) for a 1-electron harmonic well
    # H = -1/2 lap + 1/2 r^2; E(a) = 3a/2 + 3/(8a), minimised at a = 1/2.
    def logabs(params, pos, spins, atoms, charges):
        return -params["a"] * jnp.sum(pos ** 2)

    def local_energy(params, key, data):
        a = params["a"]
        r2 = jnp.sum(data.positions ** 2)
        # -1/2 lap log|psi| - 1/2 (grad log)^2 + V
        return 3.0 * a - 2.0 * a ** 2 * r2 + 0.5 * r2, None

    params = {"a": jnp.asarray(1.2)}  # too tight: dE/da > 0 at a=1.2
    opts = spring_lib.SpringOptions(damping=1e3, mu=0.0,
                                    clip_local_energy=0.0,
                                    norm_constraint=1e6,
                                    learning_rate_schedule=lambda t: 0.5)
    init, step = spring_lib.make_spring_optimizer(
        logabs, local_energy, params, opts)
    state = init(params)
    key = jax.random.PRNGKey(0)
    # walkers ~ |psi|^2 = N(0, 1/(4a) I)
    pos = jax.random.normal(key, (4096, 3)) / jnp.sqrt(4 * 1.2)
    data = AINetData(positions=pos, spins=jnp.asarray([1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.asarray([1.0]))
    new_params, state, loss, aux = step(params, state, key, data)
    # E(1.2) = 1.8 + 0.3125 = 2.1125; a must DECREASE toward 1/2.
    np.testing.assert_allclose(float(loss), 2.1125, rtol=0.05)
    assert float(new_params["a"]) < 1.2


def test_spring_singular_walker_is_inert():
    """A walker with a non-finite score/energy must not poison the step
    (the on-chip c_spring collapse mode): params stay finite and the update
    matches the clean-batch update direction."""
    from aiqmc_tpu.optim import spring as spring_lib
    from aiqmc_tpu.models.network import AINetData

    def logabs(params, pos, spins, atoms, charges):
        # b*log r term: its score d/db = log r -> -inf at r = 0, so the
        # singular walker's jacobian ROW is non-finite (not just extreme).
        r = jnp.linalg.norm(pos)
        return -params["a"] * jnp.sum(pos ** 2) + params["b"] * jnp.log(r)

    def local_energy(params, key, data):
        r2 = jnp.sum(data.positions ** 2)
        # 1/r2 divergence: the singular walker's E_L is inf (r=0) or nan
        # (nan position) — both non-finite, so _mask_nonfinite treats the
        # two cases identically.
        return (3.0 * params["a"] - 2.0 * params["a"] ** 2 * r2
                + 0.5 * r2 + 1e-6 / r2), None

    params = {"a": jnp.asarray(1.0), "b": jnp.asarray(0.1)}
    opts = spring_lib.SpringOptions(damping=1e-3, mu=0.9)
    init, step = spring_lib.make_spring_optimizer(
        logabs, local_energy, params, opts)
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (128, 3))
    bad = pos.at[7].set(jnp.zeros(3))           # singular: grad log r = inf
    nan = pos.at[7].set(jnp.full(3, jnp.nan))   # outright NaN position
    results = []
    for positions in (bad, nan):
        data = AINetData(positions=positions, spins=jnp.asarray([1.0]),
                         atoms=jnp.zeros((1, 3)), charges=jnp.asarray([1.0]))
        new_params, state, loss, aux = step(params, init(params), key, data)
        assert np.isfinite(float(new_params["a"])), "params went non-finite"
        assert np.isfinite(float(loss))
        assert int(np.asarray(state.t)) == 1
        results.append((float(new_params["a"]), float(new_params["b"])))
    # True inertness: the update must be IDENTICAL no matter WHAT the
    # singular walker's content is (r=0 coalescence vs NaN position) — the
    # masked row must contribute nothing to the centering mean, the Gram
    # matrix, or the residual. Regression for the zero-before-center bug
    # where the masked row became -mean(o) after centering.
    np.testing.assert_allclose(results[0], results[1], rtol=0, atol=0)


def test_spring_trains_helium():
    """End-to-end: SPRING descends He toward -2.90 Ha and respects the
    variational bound."""
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.zeros((1, 3))
        cfg.system.charges = np.array([2.0])
        cfg.system.spins = np.array([1.0, -1.0])
        cfg.batch_size = 256
        cfg.network.hidden_dims = ((16, 8),) * 2
        cfg.network.hidden_dims_ynlm = (4, 4)
        cfg.optim.optimizer = "spring"
        cfg.optim.iterations = 120
        cfg.optim.spring.lr.rate = 0.05
        cfg.optim.spring.lr.delay = 1e5
        cfg.mcmc.steps = 5
        cfg.mcmc.burn_in = 50
        cfg.mcmc.tstep = 0.1
        cfg.debug.deterministic = True
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        with cfg.unlocked():
            cfg.log.save_path = tmp
        result = train_lib.train(cfg)
    tail = result.energies[-30:]
    assert np.all(np.isfinite(result.energies))
    # Strong descent from the random init (typically ~ -1 to -2 at start).
    assert tail.mean() < -2.5
    # Variational bound with MC noise margin.
    assert tail.mean() > -2.95


def test_spring_matmuls_are_highest_precision():
    """Every dot touching the jacobian O must be Precision.HIGHEST: default
    TPU matmuls truncate f32 to bf16, which swamps the lam ~ 1e-3 damping of
    the B x B solve and produced finite non-variational divergence on-chip
    (runs/c_spring_big). Inspect the traced jaxpr so CPU CI catches any
    regression that only misbehaves on TPU."""
    from aiqmc_tpu.optim import spring as spring_lib
    from aiqmc_tpu.models.network import AINetData

    def logabs(params, pos, spins, atoms, charges):
        return -params["a"] * jnp.sum(pos ** 2)

    def local_energy(params, key, data):
        a = params["a"]
        r2 = jnp.sum(data.positions ** 2)
        return 3.0 * a - 2.0 * a ** 2 * r2 + 0.5 * r2, None

    params = {"a": jnp.asarray(1.2)}
    init, step = spring_lib.make_spring_optimizer(
        logabs, local_energy, params, spring_lib.SpringOptions())
    state = init(params)
    data = AINetData(positions=jnp.ones((8, 3)), spins=jnp.asarray([1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.asarray([1.0]))
    jaxpr = jax.make_jaxpr(step)(params, state, jax.random.PRNGKey(0), data)

    def dots(jpr):
        for eqn in jpr.eqns:
            if eqn.primitive.name == "dot_general":
                yield eqn
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    yield from dots(sub.jaxpr)

    found = list(dots(jaxpr.jaxpr))
    assert found, "expected dot_general eqns in the SPRING step"
    hi = jax.lax.Precision.HIGHEST
    bad = [e for e in found if e.params.get("precision") != (hi, hi)]
    # The only non-O dot_generals in this toy step come from the scalar model;
    # a real network contributes more. Require that at least the four O-dots
    # are HIGHEST and that nothing of O's (batch x nparams) shape is default.
    big = [e for e in bad
           if any(v.aval.ndim >= 2 for v in e.invars if hasattr(v, "aval"))]
    assert not big, f"non-HIGHEST matrix dot_general(s) in SPRING step: {big}"


def test_spring_pair_optimises_phase_and_magnitude():
    """Complex-pair SPRING (stacked [d log|psi|; d phase] MinSR solve): for
    the boosted hydrogen trial psi = e^{-a r} e^{i b.r},
    E(a, b) = a^2/2 - a + |b|^2/2 — the solve must descend BOTH the magnitude
    parameter a -> 1 AND the phase parameter b -> 0; a magnitude-only score
    matrix cannot move b at all (E has no a-b coupling)."""
    from aiqmc_tpu.hamiltonian import local_energy as ae
    from aiqmc_tpu.optim import spring as spring_lib
    from aiqmc_tpu.models.network import AINetData

    def signed(params, pos, spins, atoms, charges):
        r = jnp.linalg.norm(pos)
        return jnp.dot(params["b"], pos), -params["a"] * r

    def logabs(params, pos, spins, atoms, charges):
        return signed(params, pos, spins, atoms, charges)[1]

    params = {"a": jnp.asarray(0.8), "b": jnp.asarray([0.4, 0.0, -0.2])}
    e_l = ae.local_energy(signed, jnp.asarray([1.0]), (1, 0),
                          complex_output=True, pair_output=True)
    opts = spring_lib.SpringOptions(damping=1e-3, mu=0.9,
                                    clip_local_energy=5.0,
                                    norm_constraint=1e-3,
                                    learning_rate_schedule=lambda t: 0.05)
    init, step = spring_lib.make_spring_optimizer(
        logabs, e_l, params, opts, pair_output=True, signed_network=signed)
    state = init(params)
    key = jax.random.PRNGKey(0)
    # walkers ~ |psi|^2: exponential-ish; crude MH-free sampling via
    # normal(0, 1/a) is adequate for a descent test at large batch.
    pos = jax.random.normal(key, (2048, 3)) / 0.8
    data = AINetData(positions=pos, spins=jnp.asarray([1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.asarray([1.0]))
    jit_step = jax.jit(step)
    a0, b0 = float(params["a"]), float(jnp.linalg.norm(params["b"]))
    for t in range(40):
        key, sk = jax.random.split(key)
        # refresh walkers around the current magnitude scale
        pos = jax.random.normal(sk, (2048, 3)) / float(params["a"])
        data = AINetData(positions=pos, spins=jnp.asarray([1.0]),
                         atoms=jnp.zeros((1, 3)), charges=jnp.asarray([1.0]))
        params, state, loss, aux = jit_step(params, state, sk, data)
    a1, b1 = float(params["a"]), float(jnp.linalg.norm(params["b"]))
    assert np.isfinite(float(loss))
    assert abs(a1 - 1.0) < abs(a0 - 1.0), (a0, a1)   # magnitude moved to 1
    assert b1 < 0.5 * b0, (b0, b1)                   # PHASE moved toward 0


def test_spring_continuation_damping_floor():
    """Restoring a SPRING run floors damping at continuation_damping (the
    probe-1 noise-fitting cure, BASELINE.md); fresh starts and explicit
    opt-out (continuation_damping=0) keep the configured value."""
    from aiqmc_tpu import config as config_lib
    from aiqmc_tpu import train as train_lib

    cfg = config_lib.default()
    cfg.optim.optimizer = "spring"
    assert cfg.optim.spring.damping == 1e-3

    # Fresh start: untouched.
    train_lib.apply_spring_continuation_floor(cfg, restoring=False)
    assert cfg.optim.spring.damping == 1e-3

    # Continuation: floored to 0.1.
    train_lib.apply_spring_continuation_floor(cfg, restoring=True)
    assert cfg.optim.spring.damping == cfg.optim.spring.continuation_damping

    # Explicit heavier damping survives.
    cfg.optim.spring.damping = 0.5
    train_lib.apply_spring_continuation_floor(cfg, restoring=True)
    assert cfg.optim.spring.damping == 0.5

    # Opt-out.
    cfg.optim.spring.damping = 1e-3
    cfg.optim.spring.continuation_damping = 0.0
    train_lib.apply_spring_continuation_floor(cfg, restoring=True)
    assert cfg.optim.spring.damping == 1e-3

    # Non-SPRING optimizers are never touched.
    cfg.optim.optimizer = "kfac"
    cfg.optim.spring.continuation_damping = 0.1
    train_lib.apply_spring_continuation_floor(cfg, restoring=True)
    assert cfg.optim.spring.damping == 1e-3
