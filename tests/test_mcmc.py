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


def test_mala_stationary_distribution_analytic():
    """MALA must sample |psi|^2 for psi=e^{-2(r1+r2)}: <r^2> = 3/4 exactly."""
    import jax
    import jax.numpy as jnp
    from aiqmc_tpu.sampling import mala
    from aiqmc_tpu.models.network import AINetData

    def logabs(params, pos, spins, atoms, charges):
        x = pos.reshape(2, 3)
        return -2.0 * jnp.sum(jnp.linalg.norm(x, axis=-1))

    batch = 1024
    key = jax.random.PRNGKey(0)
    pos = 0.5 * jax.random.normal(key, (batch, 6))
    data = AINetData(positions=pos, spins=jnp.array([1., -1.]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([2.0]))
    step = jax.jit(mala.make_mala_step(logabs, tstep=0.05, steps=40))
    pmoves = []
    for i in range(12):
        data, pmove = step(None, data, jax.random.fold_in(key, i))
        pmoves.append(float(pmove))
    assert pmoves[-1] > 0.4, f"MALA acceptance collapsed: {pmoves}"
    r2 = np.asarray(data.positions).reshape(batch * 2, 3)
    r2 = np.sum(r2 * r2, axis=-1)
    sem = r2.std() / np.sqrt(batch)  # electrons within a walker correlate
    # 1s with Z=2: <r^2> = 3/Z^2 = 0.75
    assert abs(r2.mean() - 0.75) < max(5 * sem, 0.03), (
        f"<r^2> = {r2.mean():.4f} +- {sem:.4f}, want 0.75")


def test_mala_matches_random_walk_mean_energy():
    """Cross-sampler check on a harmonic log|psi| (Gaussian |psi|^2)."""
    import jax
    import jax.numpy as jnp
    from aiqmc_tpu.sampling import mala
    from aiqmc_tpu.models.network import AINetData

    def logabs(params, pos, spins, atoms, charges):
        return -0.5 * jnp.sum(pos ** 2)  # |psi|^2 = N(0, 1/sqrt(2)) per coord

    batch = 1024
    key = jax.random.PRNGKey(3)
    data = AINetData(positions=jax.random.normal(key, (batch, 6)),
                     spins=jnp.array([1., -1.]), atoms=jnp.zeros((1, 3)),
                     charges=jnp.array([2.0]))
    step = jax.jit(mala.make_mala_step(logabs, tstep=0.1, steps=30))
    for i in range(10):
        data, _ = step(None, data, jax.random.fold_in(key, i))
    var = np.asarray(data.positions).reshape(-1).var()
    # |psi|^2 = exp(-sum x^2) -> each coordinate N(0, 0.5)
    assert abs(var - 0.5) < 0.04, f"coordinate variance {var:.4f}, want 0.5"


def test_block_moves_stationary_gaussian():
    """blocks=2 RW sampler preserves the Gaussian |psi|^2 stationary law."""
    import jax
    import jax.numpy as jnp
    from aiqmc_tpu.sampling import mcmc as rw
    from aiqmc_tpu.models.network import AINetData

    batch = 1024

    def batch_network(params, x, spins, atoms, charges):
        return -0.25 * jnp.sum(x ** 2, axis=-1)  # |psi|^2 ~ N(0, 1) per coord

    step = jax.jit(rw.make_mcmc_step(batch_network, batch, steps=20, blocks=2,
                                     nelectrons=2))
    key = jax.random.PRNGKey(0)
    data = AINetData(positions=jax.random.normal(key, (batch, 6)) * 0.2,
                     spins=jnp.array([1., -1.]), atoms=jnp.zeros((1, 3)),
                     charges=jnp.array([2.0]))
    for i in range(15):
        data, pmove = step(None, data, jax.random.fold_in(key, i), 0.5)
    var = np.asarray(data.positions).reshape(-1).var()
    assert abs(var - 1.0) < 0.08, f"coordinate variance {var:.3f}, want 1.0"
    assert 0.1 < float(pmove) < 1.0


def test_asymmetric_proposal_preserves_stationary_distribution():
    """Harmonic-mean-scaled proposals are ASYMMETRIC — without the
    lq(reverse)-lq(forward) correction the chain converges to the wrong
    distribution. Oracle: one electron in psi = e^{-2r} => p(r) ~ r^2 e^{-4r},
    E[r] = 3/4 exactly; the asymmetric chain must reproduce it."""
    from aiqmc_tpu.sampling import mcmc

    atoms = jnp.zeros((1, 3))

    def logprob(x):
        r = jnp.linalg.norm(x.reshape(x.shape[0], -1, 3), axis=-1)
        return -4.0 * jnp.sum(r, axis=-1)

    batch = 1024
    key = jax.random.PRNGKey(0)
    key, sub = jax.random.split(key)
    x = 0.5 * jax.random.normal(sub, (batch, 3)) + 0.5
    lp = logprob(x)

    @jax.jit
    def step(x, lp, key):
        return mcmc.mh_update_asymmetric(logprob, x, lp, key, 0.4, atoms)

    pmoves = []
    for _ in range(400):
        key, sub = jax.random.split(key)
        x, lp, pm = step(x, lp, sub)
        pmoves.append(float(pm))
    r = np.linalg.norm(np.asarray(x), axis=-1)
    assert 0.3 < np.mean(pmoves[-100:]) < 0.9
    np.testing.assert_allclose(r.mean(), 0.75, atol=0.02)


def test_asymmetric_flag_wiring():
    """make_mcmc_step(scale_by_nuclear_distance=True) must run and refuse the
    (unsupported, upstream-matching) combination with blocks > 1."""
    from aiqmc_tpu.sampling import mcmc
    from aiqmc_tpu.models.network import AINetData

    def batch_net(params, x, spins, atoms, charges):
        return -jnp.sum(x.reshape(x.shape[0], -1, 3) ** 2, axis=(-1, -2))

    step = mcmc.make_mcmc_step(batch_net, 0, steps=3,
                               scale_by_nuclear_distance=True)
    data = AINetData(positions=jnp.ones((8, 6)),
                     spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    new_data, pmove = step(None, data, jax.random.PRNGKey(0), 0.2)
    assert new_data.positions.shape == (8, 6)
    assert np.isfinite(float(pmove))
    with np.testing.assert_raises(ValueError):
        mcmc.make_mcmc_step(batch_net, 0, steps=3, blocks=2, nelectrons=2,
                            scale_by_nuclear_distance=True)
