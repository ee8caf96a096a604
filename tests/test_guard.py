"""Tests for the statistical step-rejection guard (optim/guard.py).

The guard extends the reference's NaN-only failure detection (ref
AIQMCrelease3/Optimizer/adam.py:74-79) with statistical rejection of
finite-but-pathological steps — the failure mode that diverged the Si
all-electron run (variance explosion at finite energies).
"""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.optim import guard as guard_lib


def _make_stub(batch=64):
    """combined_step stub whose loss/variance are driven by the key arg
    (interpreted as [loss, variance]); params increment on every call."""

    def combined_step(params, opt_state, data, key, width):
        loss, var = key[0], key[1]
        new_params = {"w": params["w"] + 1.0}
        new_inner = opt_state + 1
        return new_params, new_inner, data, loss, {"variance": var}, 0.5

    data = AINetData(
        positions=jnp.zeros((batch, 6)), spins=jnp.ones((2,)),
        atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    return combined_step, data


def _run(steps, var_factor=8.0, jump_sigmas=20.0, warmup=5, decay=0.9,
         var_ceiling=0.0):
    combined_step, data = _make_stub()
    wrap_init, guarded = guard_lib.make_guarded_step(
        combined_step, var_factor=var_factor, jump_sigmas=jump_sigmas,
        warmup=warmup, decay=decay, var_ceiling=var_ceiling)
    init = wrap_init(lambda params: jnp.zeros((), jnp.int32))
    params = {"w": jnp.zeros(())}
    state = init(params)
    history = []
    for loss, var in steps:
        params, state, data, out_loss, stats, _ = guarded(
            params, state, data, jnp.array([loss, var]), 0.1)
        history.append((float(params["w"]), int(stats["guard_rejected"])))
    return params, state, history


class TestGuard:

    def test_accepts_stable_run(self):
        steps = [(-2.0 + 0.01 * np.sin(i), 1.0 + 0.5 * np.cos(i))
                 for i in range(40)]
        params, state, history = _run(steps)
        assert history[-1][0] == 40.0          # every step applied
        assert history[-1][1] == 0             # zero rejections
        g = state[1]
        assert abs(float(g.ew_energy) - (-2.0)) < 0.1
        assert 0.5 < float(g.ew_var) < 1.6

    def test_no_rejection_during_warmup(self):
        # Wild statistics in the first `warmup` steps must pass (init/descent
        # transients look pathological to any threshold).
        steps = [(-100.0 * i, 1000.0 * (i + 1)) for i in range(5)]
        params, state, history = _run(steps, warmup=5)
        assert history[-1][1] == 0
        assert history[-1][0] == 5.0

    def test_variance_explosion_rejected(self):
        steps = [(-2.0, 1.0)] * 20 + [(-2.0, 50.0)] * 3
        params, state, history = _run(steps, var_factor=8.0)
        # The 3 exploded-variance steps are rejected: params frozen at 20.
        assert history[-1][0] == 20.0
        assert history[-1][1] == 3
        # Running stats were not polluted by the rejected steps.
        assert float(state[1].ew_var) < 2.0

    def test_energy_plunge_rejected(self):
        # sem = sqrt(ew_var / batch) = sqrt(1/64) = 0.125; jump of 10 is
        # 80 sigma — the Si-collapse signature at still-finite values.
        steps = [(-2.0, 1.0)] * 20 + [(-12.0, 1.0)]
        params, state, history = _run(steps, jump_sigmas=20.0)
        assert history[-1][0] == 20.0
        assert history[-1][1] == 1

    def test_normal_scatter_not_rejected(self):
        # Routine 2-3x variance scatter (seen in healthy runs) must pass.
        rng = np.random.RandomState(0)
        steps = [(-2.0 + 0.01 * rng.randn(),
                  float(np.clip(rng.lognormal(0.0, 0.5), 0.3, 3.0)))
                 for _ in range(60)]
        params, state, history = _run(steps)
        assert history[-1][1] == 0

    def test_gradual_creep_evades_relative_tests_but_not_ceiling(self):
        """The runs/c_spring_probe failure mode: variance growing ~10% per
        step drags the EW window along, so the relative var_factor test never
        fires — an absolute ceiling freezes the run at the ceiling."""
        creep = [(-2.0, 1.0)] * 20 + [(-2.0, 1.0 * 1.1 ** i)
                                      for i in range(1, 60)]
        # Relative tests alone: creep reaches 280x the plateau variance
        # with zero rejections (the documented blind spot).
        _, _, hist = _run(creep)
        assert hist[-1][1] == 0
        # Ceiling at 10x the plateau: every step beyond it is rejected and
        # the params freeze.
        _, state, hist = _run(creep, var_ceiling=10.0)
        assert hist[-1][1] > 0
        n_over = sum(1 for _, v in creep if v > 10.0)
        assert hist[-1][1] == n_over
        assert float(state[1].ew_var) < 11.0

    def test_nonfinite_rejected_after_warmup(self):
        steps = [(-2.0, 1.0)] * 20 + [(float("nan"), 1.0)]
        params, state, history = _run(steps)
        assert history[-1][0] == 20.0
        assert history[-1][1] == 1


class TestGuardTraining:

    def test_train_integration_and_checkpoint(self, tmp_path):
        """Guarded He VMC: runs, writes a restorable checkpoint with the
        augmented (opt_state, GuardState) tree."""
        from aiqmc_tpu import train as train_lib
        from aiqmc_tpu import config as config_lib

        cfg = config_lib.default()
        with cfg.unlocked():
            cfg.system.atoms = np.zeros((1, 3))
            cfg.system.charges = np.array([2.0])
            cfg.system.spins = np.array([1.0, -1.0])
            cfg.batch_size = 32
            cfg.network.hidden_dims = ((8, 4),) * 2
            cfg.network.hidden_dims_ynlm = (4, 4)
            cfg.optim.optimizer = "adam"
            cfg.optim.iterations = 4
            cfg.optim.guard.enable = True
            cfg.optim.guard.warmup = 2
            cfg.mcmc.burn_in = 0
            cfg.mcmc.steps = 2
            cfg.pretrain.iterations = 0
            cfg.log.save_path = str(tmp_path)
            cfg.log.save_frequency = 0.0
            cfg.debug.deterministic = True
        result = train_lib.train(cfg)
        assert np.isfinite(result.energies).all()

        # Restore-and-continue keeps the guard state through the checkpoint.
        with cfg.unlocked():
            cfg.optim.iterations = 6
        result2 = train_lib.train(cfg)
        assert np.isfinite(result2.energies).all()


def test_guard_auto_default():
    """enable="auto" (the config default) arms the guard exactly for the
    curvature optimizers whose finite divergences motivated it."""
    from aiqmc_tpu import config as config_lib
    from aiqmc_tpu import train as train_lib

    cfg = config_lib.default()
    assert cfg.optim.guard.enable is None  # placeholder == "auto"
    for opt, expected in [("kfac", True), ("spring", True),
                          ("adam", False), ("lamb", False), ("none", False)]:
        with cfg.unlocked():
            cfg.optim.optimizer = opt
        assert train_lib._guard_enabled(cfg) == expected, opt
    with cfg.unlocked():
        cfg.optim.optimizer = "adam"
        cfg.optim.guard.enable = True
    assert train_lib._guard_enabled(cfg)
    with cfg.unlocked():
        cfg.optim.optimizer = "kfac"
        cfg.optim.guard.enable = False
    assert not train_lib._guard_enabled(cfg)
