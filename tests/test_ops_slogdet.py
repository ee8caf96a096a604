"""Batched GE slogdet/inv: agreement with jnp.linalg to second derivatives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiqmc_tpu.ops import slogdet as ops_slogdet


@pytest.mark.parametrize("n", [2, 4, 9, 16])
def test_slogdet_matches_linalg(n):
    rng = np.random.RandomState(n)
    # Well-conditioned batch (tests run in float32; conftest has no x64).
    a = jnp.asarray(rng.normal(size=(64, 3, n, n)) + 2.0 * np.eye(n))
    sign, logabs = ops_slogdet.slogdet(a)
    sign_w, logabs_w = jnp.linalg.slogdet(a)
    np.testing.assert_array_equal(np.asarray(sign), np.asarray(sign_w))
    np.testing.assert_allclose(np.asarray(logabs), np.asarray(logabs_w),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n", [2, 5, 12])
def test_inv_matches_linalg(n):
    rng = np.random.RandomState(n + 100)
    a = jnp.asarray(rng.normal(size=(32, n, n)) + 2.0 * np.eye(n))
    y = ops_slogdet.inv(a)
    np.testing.assert_allclose(np.asarray(y), np.asarray(jnp.linalg.inv(a)),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jnp.einsum("bij,bjk->bik", a, y)),
                               np.broadcast_to(np.eye(n), (32, n, n)),
                               atol=2e-4)


def test_slogdet_gradient_and_hessian_match():
    rng = np.random.RandomState(7)
    a = jnp.asarray(rng.normal(size=(5, 5)) + 2.0 * np.eye(5))

    f_fast = lambda x: ops_slogdet.slogdet(x)[1]
    f_ref = lambda x: jnp.linalg.slogdet(x)[1]
    np.testing.assert_allclose(np.asarray(jax.grad(f_fast)(a)),
                               np.asarray(jax.grad(f_ref)(a)),
                               rtol=1e-3, atol=1e-4)
    # Forward-over-reverse (the kinetic-energy pattern).
    v = jnp.asarray(rng.normal(size=(5, 5)))
    _, h_fast = jax.jvp(jax.grad(f_fast), (a,), (v,))
    _, h_ref = jax.jvp(jax.grad(f_ref), (a,), (v,))
    np.testing.assert_allclose(np.asarray(h_fast), np.asarray(h_ref),
                               rtol=1e-2, atol=1e-3)


def test_inv_jvp_matches():
    rng = np.random.RandomState(11)
    a = jnp.asarray(rng.normal(size=(4, 4)) + 2.0 * np.eye(4))
    v = jnp.asarray(rng.normal(size=(4, 4)))
    y1, dy1 = jax.jvp(ops_slogdet.inv, (a,), (v,))
    y2, dy2 = jax.jvp(jnp.linalg.inv, (a,), (v,))
    np.testing.assert_allclose(np.asarray(dy1), np.asarray(dy2),
                               rtol=1e-2, atol=1e-3)


def test_singular_matrix_semantics():
    a = jnp.asarray(np.diag([1.0, 2.0, 0.0]))
    sign, logabs = ops_slogdet.slogdet(a)
    assert float(sign) == 0.0
    assert np.isneginf(float(logabs))


def test_ill_conditioned_pivoting():
    # Without partial pivoting this loses ~8 digits.
    a = jnp.asarray([[1e-12, 1.0], [1.0, 1.0]])
    _, logabs = ops_slogdet.slogdet(a)
    np.testing.assert_allclose(float(logabs), 0.0, atol=1e-6)


def test_network_blocks_use_fast_path():
    from aiqmc_tpu.models import blocks
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.normal(size=(4, 6, 6)) + 2.0 * np.eye(6))
    sign, logdet = blocks.slogdet(x)
    sign_w, logdet_w = jnp.linalg.slogdet(x)
    np.testing.assert_allclose(np.asarray(logdet), np.asarray(logdet_w),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sign), np.asarray(sign_w))


def test_slogdet_pair_tiny_magnitudes_no_underflow():
    """Pivot magnitudes ~1e-30 must not underflow (the old pr^2+pi^2 form
    zeroed them in f32 -> -inf/NaN log|psi| for far-electron configurations
    on complex-pair networks; hypot survives)."""
    from aiqmc_tpu.ops import slogdet as S
    rng = np.random.RandomState(3)
    scale = 1e-18
    ar = (rng.standard_normal((3, 4, 4)) * scale).astype(np.float32)
    ai = (rng.standard_normal((3, 4, 4)) * scale).astype(np.float32)
    cos, sin, logabs = S.slogdet_pair(jnp.asarray(ar), jnp.asarray(ai))
    assert np.all(np.isfinite(np.asarray(logabs))), np.asarray(logabs)
    # float64 oracle
    want = np.linalg.slogdet(ar.astype(np.float64)
                             + 1j * ai.astype(np.float64))[1]
    np.testing.assert_allclose(np.asarray(logabs), want, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cos) ** 2 + np.asarray(sin) ** 2,
                               1.0, atol=1e-5)


def test_logdet_matmul_pair_all_underflowed_is_neg_inf_not_nan():
    """All determinants at zero magnitude: log|psi| must be -inf (psi = 0),
    never NaN (the naive max-subtraction gave exp(-inf + inf))."""
    from aiqmc_tpu.models import blocks
    xr = jnp.zeros((2, 3, 3))
    xi = jnp.zeros((2, 3, 3))
    phase, log = blocks.logdet_matmul_pair([(xr, xi)])
    assert not np.isnan(float(log))
    assert float(log) == -np.inf
    assert np.isfinite(float(phase))


def test_logdet_matmul_all_underflowed_is_neg_inf_not_nan():
    """Real path symmetry: all-zero determinants -> log|psi| = -inf, not NaN
    (max-subtraction floor); the 1x1-only branch (int logdet init) still
    promotes cleanly."""
    from aiqmc_tpu.models import blocks
    phase, log = blocks.logdet_matmul([jnp.zeros((2, 3, 3))])
    assert not np.isnan(float(log))
    assert float(log) == -np.inf
    # 1x1-only blocks: logdet stays the python-int reduce init.
    phase1, log1 = blocks.logdet_matmul([jnp.full((2, 1, 1), 0.5)])
    np.testing.assert_allclose(float(log1), np.log(2 * 0.5), rtol=1e-6)
