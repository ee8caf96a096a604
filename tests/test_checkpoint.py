"""Checkpoint roundtrip tests (stable msgpack format)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aiqmc_tpu import checkpoint
from aiqmc_tpu.models.network import AINetData


def test_save_restore_roundtrip(tmp_path):
    params = {"layer": {"w": jnp.arange(6.0).reshape(2, 3),
                        "b": jnp.ones((3,))}}
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    data = AINetData(positions=jnp.ones((4, 6)), spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([2.0]))
    path = checkpoint.save(str(tmp_path), 7, data, params, opt_state)
    assert os.path.exists(path)

    found = checkpoint.find_last_checkpoint(str(tmp_path))
    assert found == path

    t, data2, params2, opt_state2, _ = checkpoint.restore(
        found, batch_size=4, target_params=params, target_opt_state=opt_state)
    assert t == 8
    np.testing.assert_array_equal(np.asarray(data2.positions),
                                  np.asarray(data.positions))
    np.testing.assert_array_equal(np.asarray(params2["layer"]["w"]),
                                  np.asarray(params["layer"]["w"]))
    leaves1 = jax.tree_util.tree_leaves(opt_state)
    leaves2 = jax.tree_util.tree_leaves(opt_state2)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_without_targets(tmp_path):
    params = {"w": jnp.ones((2, 2))}
    data = AINetData(positions=jnp.ones((2, 6)), spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([2.0]))
    checkpoint.save(str(tmp_path), 0, data, params, {"dummy": jnp.zeros(1)})
    found = checkpoint.find_last_checkpoint(str(tmp_path))
    t, _, params2, _, _ = checkpoint.restore(found)
    assert t == 1
    np.testing.assert_array_equal(np.asarray(params2["w"]), np.ones((2, 2)))


def test_batch_size_mismatch_raises(tmp_path):
    params = {"w": jnp.ones((2, 2))}
    data = AINetData(positions=jnp.ones((2, 6)), spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([2.0]))
    checkpoint.save(str(tmp_path), 0, data, params, {})
    found = checkpoint.find_last_checkpoint(str(tmp_path))
    try:
        checkpoint.restore(found, batch_size=16)
    except ValueError:
        return
    raise AssertionError("expected ValueError on batch mismatch")


def test_batch_resize_subsample_and_tile(tmp_path):
    """restore(allow_batch_resize=True) shrinks by subsampling and grows by
    tiling (beyond the reference: enables batch changes across restores, e.g.
    a KFAC->SPRING continuation at a smaller jacobian-friendly batch)."""
    params = {"w": jnp.ones((2, 2))}
    pos = jnp.arange(4 * 6, dtype=jnp.float32).reshape(4, 6)
    data = AINetData(positions=pos, spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([2.0]))
    checkpoint.save(str(tmp_path), 0, data, params, {})
    found = checkpoint.find_last_checkpoint(str(tmp_path))
    _, small, _, _, _ = checkpoint.restore(found, batch_size=2,
                                           allow_batch_resize=True)
    np.testing.assert_array_equal(np.asarray(small.positions),
                                  np.asarray(pos)[:2])
    _, big, _, _, _ = checkpoint.restore(found, batch_size=6,
                                         allow_batch_resize=True)
    assert big.positions.shape == (6, 6)
    np.testing.assert_array_equal(np.asarray(big.positions[4:]),
                                  np.asarray(pos)[:2])


def test_extras_roundtrip(tmp_path):
    """mcmc_width / density-state extras survive the roundtrip
    (ref ferminet/checkpoint.py:92-181 payload extras)."""
    params = {"w": jnp.ones((2, 2))}
    data = AINetData(positions=jnp.ones((2, 6)), spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([2.0]))
    extra = {"mcmc_width": np.asarray(0.37),
             "density_positions": np.arange(6.0).reshape(2, 3),
             "density_rho_count": np.asarray(5)}
    checkpoint.save(str(tmp_path), 3, data, params, {}, extra=extra)
    found = checkpoint.find_last_checkpoint(str(tmp_path))
    _, _, _, _, extra2 = checkpoint.restore(found)
    assert set(extra2) == set(extra)
    for k in extra:
        np.testing.assert_array_equal(extra2[k], extra[k])


def test_param_mismatch_diagnosis(tmp_path):
    """A jastrow_ae presence mismatch produces an actionable error
    (the jastrow_ae auto-default changed for use_pp systems).

    The realistic failure shape: every network emits a top-level
    'jastrow_ae' entry — the null jastrow's params are an EMPTY dict — so
    the diagnosis must compare leaf paths, not top-level keys (flax
    from_bytes would otherwise silently drop the saved Jastrow leaves)."""
    import pytest
    saved = {"streams": {"w": jnp.ones((2, 2))},
             "jastrow_ae": {"alpha": jnp.ones((3,))}}
    data = AINetData(positions=jnp.ones((2, 6)), spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([2.0]))
    checkpoint.save(str(tmp_path), 0, data, saved, {})
    found = checkpoint.find_last_checkpoint(str(tmp_path))
    # Network built with jastrow_ae=False: the key is PRESENT but empty.
    target = {"streams": {"w": jnp.zeros((2, 2))}, "jastrow_ae": {}}
    with pytest.raises(ValueError, match="jastrow_ae=True"):
        checkpoint.restore(found, target_params=target)
    # Key entirely absent (hand-built trees) must still be caught.
    with pytest.raises(ValueError, match="jastrow_ae=True"):
        checkpoint.restore(found,
                           target_params={"streams": {"w": jnp.zeros((2, 2))}})


def test_param_shape_mismatch_diagnosis(tmp_path):
    """Same leaf paths but different shapes (hidden_dims change) -> clear
    error naming the first offending leaf, not a cryptic flax failure."""
    import pytest
    saved = {"streams": {"w": jnp.ones((2, 2))}, "jastrow_ae": {}}
    data = AINetData(positions=jnp.ones((2, 6)), spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([2.0]))
    checkpoint.save(str(tmp_path), 0, data, saved, {})
    found = checkpoint.find_last_checkpoint(str(tmp_path))
    target = {"streams": {"w": jnp.zeros((4, 4))}, "jastrow_ae": {}}
    with pytest.raises(ValueError, match="streams/w"):
        checkpoint.restore(found, target_params=target)


def test_truncated_latest_falls_back(tmp_path):
    """A `timeout` kill mid-write must not break restore-and-continue: the
    scanner skips a truncated newest file (and any leftover .tmp) and returns
    the previous good checkpoint."""
    params = {"w": jnp.ones((2,))}
    data = AINetData(positions=jnp.ones((4, 6)), spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([2.0]))
    good = checkpoint.save(str(tmp_path), 3, data, params, [])
    bad = checkpoint.save(str(tmp_path), 4, data, params, [])
    with open(bad, "rb") as f:
        head = f.read(200)          # cut before the zip central directory
    with open(bad, "wb") as f:
        f.write(head)
    # Simulated kill mid-savez under the atomic-write scheme: only a .tmp.
    with open(os.path.join(str(tmp_path),
                           checkpoint.CKPT_PREFIX + "000005.npz.tmp"),
              "wb") as f:
        f.write(b"partial")
    found = checkpoint.find_last_checkpoint(str(tmp_path))
    assert found == good
    t, *_ = checkpoint.restore(found, batch_size=4, target_params=params)
    assert t == 4


def test_save_is_atomic(tmp_path):
    """save() leaves no .tmp behind and the final file loads."""
    params = {"w": jnp.ones((2,))}
    data = AINetData(positions=jnp.ones((4, 6)), spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([2.0]))
    path = checkpoint.save(str(tmp_path), 1, data, params, [])
    assert not [f for f in os.listdir(str(tmp_path)) if f.endswith(".tmp")]
    assert checkpoint.find_last_checkpoint(str(tmp_path)) == path


def test_has_ema(tmp_path):
    """has_ema: the one-call EMA auto-detection the DMC scripts share."""
    params = {"w": jnp.ones((2, 2))}
    data = AINetData(positions=jnp.ones((2, 6)), spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([2.0]))
    plain = tmp_path / "plain"
    plain.mkdir()
    checkpoint.save(str(plain), 1, data, params, {})
    assert not checkpoint.has_ema(str(plain))
    assert not checkpoint.has_ema(str(tmp_path / "missing"))

    ema_dir = tmp_path / "ema"
    ema_dir.mkdir()
    extra = {checkpoint.EMA_EXTRA_KEY: checkpoint.ema_to_extra(params)}
    checkpoint.save(str(ema_dir), 1, data, params, {}, extra=extra)
    assert checkpoint.has_ema(str(ema_dir))
    assert checkpoint.has_ema(checkpoint.find_last_checkpoint(str(ema_dir)))
