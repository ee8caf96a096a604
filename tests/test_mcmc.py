"""Sampler correctness: both samplers must preserve |psi|^2.

For psi = exp(-|x|^2 / 2), |psi|^2 is a standard normal in every coordinate, so
after equilibration E[x_i^2] = 0.5 (variance of N(0, 1/sqrt(2))... precisely:
|psi|^2 = exp(-2 * |x|^2 / 2) = exp(-|x|^2) => each coordinate ~ N(0, 1/2)).
"""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.sampling import drift_diffusion, mcmc


def _gauss_net(params, pos, spins, atoms, charges):
    del params, spins, atoms, charges
    return jnp.zeros(()), -0.5 * jnp.sum(pos ** 2)


def _make_data(batch, nelec):
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (batch, nelec * 3))
    return AINetData(positions=pos,
                     spins=jnp.asarray([1.0] * nelec),
                     atoms=jnp.zeros((1, 3)),
                     charges=jnp.ones((1,)))


def test_drift_diffusion_preserves_gaussian():
    batch, nelec = 256, 2
    data = _make_data(batch, nelec)
    mc = drift_diffusion.main_monte_carlo(
        _gauss_net, tstep=0.3, ndim=3, nelectrons=nelec, nsteps=30,
        batch_size=batch)
    mc = jax.jit(mc)
    key = jax.random.PRNGKey(1)
    samples = []
    for i in range(25):
        key, subkey = jax.random.split(key)
        data, pmove = mc(None, data, subkey)
        if i >= 5:
            samples.append(np.asarray(data.positions))
    var = np.var(np.concatenate(samples, axis=0))
    np.testing.assert_allclose(var, 0.5, rtol=0.08)
    assert 0.3 < float(pmove) < 1.0


def test_random_walk_preserves_gaussian():
    batch, nelec = 256, 2
    data = _make_data(batch, nelec)
    batch_network = jax.vmap(lambda p, x, s, a, c: _gauss_net(p, x, s, a, c)[1],
                             in_axes=(None, 0, None, None, None))
    step = mcmc.make_mcmc_step(batch_network, batch, steps=20)
    step = jax.jit(step, static_argnums=())
    key = jax.random.PRNGKey(2)
    samples = []
    for i in range(30):
        key, subkey = jax.random.split(key)
        data, pmove = step(None, data, subkey, 0.5)
        if i >= 8:
            samples.append(np.asarray(data.positions))
    var = np.var(np.concatenate(samples, axis=0))
    np.testing.assert_allclose(var, 0.5, rtol=0.08)
    assert 0.2 < float(pmove) < 0.95
