"""Pallas pairwise-features kernel vs the pure-JAX reference."""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.ops import pairwise


def test_fallback_matches_network_features():
    from aiqmc_tpu.models.features import construct_input_features

    nelec = 4
    pos = jax.random.normal(jax.random.PRNGKey(0), (8, nelec * 3))
    feats = pairwise.ee_features_batch(pos, nelec, use_pallas=False)
    for b in range(3):
        _, ee, _, r_ee = construct_input_features(
            pos[b], jnp.zeros((1, 3)))
        np.testing.assert_allclose(np.asarray(feats[b, ..., 0]),
                                   np.asarray(r_ee[..., 0]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(feats[b, ..., 1:]),
                                   np.asarray(ee), rtol=1e-6)


def test_pallas_interpret_matches_fallback():
    nelec = 4
    pos = jax.random.normal(jax.random.PRNGKey(1), (4, nelec * 3))
    want = pairwise.ee_features_batch(pos, nelec, use_pallas=False)
    got = pairwise.ee_features_batch(pos, nelec, use_pallas=True,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
