"""Density / one-RDM estimator tests."""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import density
from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.parallel import multi_host


def _gauss_net(params, pos, spins, atoms, charges):
    del params, spins, atoms, charges
    return jnp.ones(()), -0.5 * jnp.sum(pos ** 2)


def test_one_rdm_identity_point():
    """Replacing electron 0 by its own position must give ratio exactly 1."""
    rdm = density.make_one_rdm(_gauss_net, nelectrons=2)
    pos = jnp.asarray(np.random.RandomState(0).normal(size=(4, 6)))
    data = AINetData(positions=pos, spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    rprime = pos[0, :3][None]  # electron 0 of walker 0
    out = rdm(None, data, rprime)
    np.testing.assert_allclose(float(out[0, 0]), 1.0, rtol=1e-5)


def test_one_rdm_gaussian_ratio():
    """For psi = exp(-|x|^2/2), ratio = exp((|r1|^2 - |r'|^2)/2) exactly."""
    rdm = density.make_one_rdm(_gauss_net, nelectrons=2)
    pos = jnp.asarray([[1.0, 0, 0, 0, 1.0, 0]])
    data = AINetData(positions=pos, spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    rprime = jnp.asarray([[2.0, 0.0, 0.0]])
    out = rdm(None, data, rprime)
    want = np.exp((1.0 - 4.0) / 2.0)
    np.testing.assert_allclose(float(out[0, 0]), want, rtol=1e-5)


def test_radial_density_normalisation():
    rng = np.random.RandomState(1)
    pos = jnp.asarray(rng.normal(size=(512, 6)))
    data = AINetData(positions=pos, spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    mids, n_r = density.radial_density_profile(data, bins=40, limit=6.0)
    integral = float(jnp.sum(
        n_r * 4.0 * np.pi * mids ** 2 * (mids[1] - mids[0])))
    np.testing.assert_allclose(integral, 2.0, rtol=0.05)  # 2 electrons


def test_multi_host_single_process():
    assert multi_host.broadcast_seed(42) == 42
    assert multi_host.check_synced({"w": jnp.ones((3,))})
