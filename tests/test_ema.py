"""Polyak-averaged (EMA) parameter tracking (beyond the reference's zoo;
standard NNQMC eval trick: averaged iterates have lower MC fluctuation at a
training plateau)."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import checkpoint as ckpt_lib
from aiqmc_tpu import config as config_lib
from aiqmc_tpu import train as train_lib


def test_ema_extra_roundtrip():
    params = {"layer": {"w": jnp.arange(6.0).reshape(2, 3),
                        "b": jnp.ones(3)}}
    blob = ckpt_lib.ema_to_extra(params)
    assert blob.dtype == np.uint8
    out = ckpt_lib.ema_from_extra(
        {ckpt_lib.EMA_EXTRA_KEY: blob},
        jax.tree_util.tree_map(jnp.zeros_like, params))
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt_lib.ema_from_extra({}, params) is None
    assert ckpt_lib.ema_from_extra(None, params) is None


def _he_cfg(tmp, iterations=40):
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.zeros((1, 3))
        cfg.system.charges = np.array([2.0])
        cfg.system.spins = np.array([1.0, -1.0])
        cfg.batch_size = 128
        cfg.network.hidden_dims = ((8, 4),) * 2
        cfg.network.hidden_dims_ynlm = (4, 4)
        cfg.optim.iterations = iterations
        cfg.optim.optimizer = "adam"
        cfg.mcmc.burn_in = 10
        cfg.mcmc.steps = 3
        cfg.debug.deterministic = True
        cfg.log.save_path = tmp
        cfg.log.save_frequency = 0.0   # checkpoint every iteration window
    return cfg


def test_ema_tracked_saved_and_evaluated():
    with tempfile.TemporaryDirectory() as tmp:
        cfg = _he_cfg(tmp)
        with cfg.unlocked():
            cfg.optim.ema_decay = 0.9
        result = train_lib.train(cfg)
        last = ckpt_lib.find_last_checkpoint(result.ckpt_save_path)
        with open(last, "rb") as f:
            files = np.load(f, allow_pickle=False).files
        assert "extra_" + ckpt_lib.EMA_EXTRA_KEY in files

        # EMA must differ from the raw final iterate (training moved) but
        # stay in the same ballpark (it averages the recent trajectory).
        _, _, raw_params, _, extra = ckpt_lib.restore(
            last, cfg.batch_size,
            target_params=jax.device_get(result.params))
        ema = ckpt_lib.ema_from_extra(extra, raw_params)
        diffs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(
            jax.tree_util.tree_leaves(ema),
            jax.tree_util.tree_leaves(raw_params)) if a.size]
        assert max(diffs) > 0.0

        # Frozen eval from the EMA params end-to-end (restore_use_ema).
        eval_cfg = _he_cfg(tmp, iterations=10)
        with eval_cfg.unlocked():
            eval_cfg.optim.optimizer = "none"
            eval_cfg.log.restore_path = tmp
            eval_cfg.log.restore_use_ema = True
            eval_cfg.mcmc.burn_in = 5
        eval_result = train_lib.train(eval_cfg)
        assert np.all(np.isfinite(eval_result.energies))


def test_restore_use_ema_without_ema_raises():
    with tempfile.TemporaryDirectory() as tmp:
        cfg = _he_cfg(tmp, iterations=5)
        train_lib.train(cfg)  # ema_decay = 0: no EMA in the checkpoint
        cfg2 = _he_cfg(tmp, iterations=5)
        with cfg2.unlocked():
            cfg2.log.restore_path = tmp
            cfg2.log.restore_use_ema = True
        try:
            train_lib.train(cfg2)
        except ValueError as e:
            assert "ema" in str(e).lower()
        else:
            raise AssertionError("expected ValueError for missing EMA params")
