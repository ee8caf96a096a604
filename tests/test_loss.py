"""Loss/gradient tests: clipping behaviour and the custom-JVP energy gradient."""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import loss as loss_lib
from aiqmc_tpu.models.network import AINetData


def test_clip_local_values_tv():
    values = jnp.array([0.0, 1.0, 2.0, 100.0])
    mean = jnp.mean(values)
    center, diff = loss_lib.clip_local_values(
        values, mean, clip_scale=1.0, clip_from_median=True,
        center_at_clipped_value=True)
    # median = 1.5; tv = mean |v - 1.5| = (1.5 + 0.5 + 0.5 + 98.5)/4 = 25.25
    clipped_expected = np.clip(np.asarray(values), 1.5 - 25.25, 1.5 + 25.25)
    np.testing.assert_allclose(np.asarray(diff) + np.asarray(center),
                               clipped_expected, rtol=1e-6)


def _toy_setup():
    """Single-parameter model: psi_theta(x) = exp(theta * g(x)) with local energy
    E_L(x) independent of theta => dE/dtheta = 2 <(E_L - E) g> under <|psi|^2>.
    We check the custom JVP reproduces that covariance formula on a fixed batch.
    """

    def network(params, pos, spins, atoms, charges):
        del spins, atoms, charges
        return params["theta"] * jnp.sum(jnp.sin(pos))

    def local_energy(params, key, data):
        del params, key
        return jnp.sum(data.positions ** 2), None

    return network, local_energy


def test_custom_jvp_gradient_matches_covariance():
    network, local_energy = _toy_setup()
    total_energy = loss_lib.make_loss(network, local_energy,
                                      clip_local_energy=0.0,
                                      complex_output=False)
    batch = 64
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (batch, 6))
    data = AINetData(positions=pos, spins=jnp.ones((2,)),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    params = {"theta": jnp.asarray(0.3)}
    (loss_val, aux), grads = jax.value_and_grad(
        total_energy, argnums=0, has_aux=True)(params, key, data)

    e_l = np.asarray(aux.local_energy)
    g = np.sin(np.asarray(pos)).sum(axis=1)
    # Reference/FermiNet convention: the JVP returns <(E_L - E) dlogpsi> without
    # the textbook factor 2 (absorbed into the learning rate; ref loss.py:269).
    want = np.mean((e_l - e_l.mean()) * g)
    np.testing.assert_allclose(float(grads["theta"]), want, rtol=1e-4)
    np.testing.assert_allclose(float(loss_val), e_l.mean(), rtol=1e-6)


def test_loss_variance_reported():
    network, local_energy = _toy_setup()
    total_energy = loss_lib.make_loss(network, local_energy)
    key = jax.random.PRNGKey(1)
    pos = jax.random.normal(key, (32, 6))
    data = AINetData(positions=pos, spins=jnp.ones((2,)),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    loss_val, aux = total_energy({"theta": jnp.asarray(0.1)}, key, data)
    e_l = np.asarray(aux.local_energy)
    np.testing.assert_allclose(float(aux.variance), e_l.var(), rtol=1e-5)


def test_el_chunk_matches_vmap():
    """lax.map-chunked E_L must reproduce the full-vmap loss AND gradient.

    el_chunk is both a memory bound and the workaround program shape for
    toolchains that miscompile the full-batch fused Laplacian program
    (probe_forward_ladder.py rung F)."""
    network, local_energy = _toy_setup()
    kwargs = dict(clip_local_energy=1.0, complex_output=False)
    loss_full = loss_lib.make_loss(network, local_energy, **kwargs)
    loss_chunk = loss_lib.make_loss(network, local_energy, el_chunk=16,
                                    **kwargs)
    batch = 64
    key = jax.random.PRNGKey(3)
    pos = jax.random.normal(key, (batch, 6))
    data = AINetData(positions=pos, spins=jnp.ones((2,)),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    params = {"theta": jnp.asarray(0.3)}
    (l_a, aux_a), g_a = jax.value_and_grad(loss_full, has_aux=True)(
        params, key, data)
    (l_b, aux_b), g_b = jax.value_and_grad(loss_chunk, has_aux=True)(
        params, key, data)
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(aux_a.local_energy),
                               np.asarray(aux_b.local_energy), rtol=1e-6)
    np.testing.assert_allclose(float(g_a["theta"]), float(g_b["theta"]),
                               rtol=1e-5)


def test_el_chunk_requires_divisible_batch():
    network, local_energy = _toy_setup()
    loss_chunk = loss_lib.make_loss(network, local_energy, el_chunk=48)
    pos = jnp.zeros((64, 6))
    data = AINetData(positions=pos, spins=jnp.ones((2,)),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    try:
        loss_chunk({"theta": jnp.asarray(0.3)}, jax.random.PRNGKey(0), data)
    except ValueError as e:
        assert "el_chunk" in str(e)
    else:
        raise AssertionError("expected ValueError on non-divisible batch")
