"""Tests for correlated-sample drivers and the named-axis collectives."""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import constants, corrsamples, vmc_eval
from aiqmc_tpu.dmc import correlated as dmc_corr
from aiqmc_tpu.hamiltonian import local_energy as ae_local_energy
from aiqmc_tpu.models.network import AINetData


def _stub_net(params, pos, spins, atoms, charges):
    del params, spins, charges
    r = jnp.linalg.norm(jnp.reshape(pos, (-1, 3)) - atoms[0], axis=-1)
    return jnp.ones(()), -jnp.sum(r)


def _make_le(charges):
    def make(atoms):
        return ae_local_energy.local_energy(_stub_net, charges, (1, 0))
    return make


def test_correlated_energy_sweep_zero_displacement():
    """Zero displacement must reproduce the reference energy exactly."""
    atoms = jnp.zeros((1, 3))
    charges = jnp.ones((1,))
    data = AINetData(
        positions=jnp.asarray(np.random.RandomState(0).normal(size=(16, 3))),
        spins=jnp.array([1.0]), atoms=atoms, charges=charges)
    e_ref, energies = vmc_eval.correlated_energy_sweep(
        _stub_net, _make_le(charges), None, jax.random.PRNGKey(0), data,
        [atoms])
    np.testing.assert_allclose(float(energies[0]), float(e_ref), rtol=1e-5)


def test_dmc_correlated_accumulator():
    atoms = jnp.zeros((1, 3))
    charges = jnp.ones((1,))
    data = AINetData(
        positions=jnp.asarray(np.random.RandomState(1).normal(size=(16, 3))),
        spins=jnp.array([1.0]), atoms=atoms, charges=charges)
    weights = jnp.asarray(np.random.RandomState(2).uniform(0.5, 1.5, 16))
    acc = dmc_corr.make_correlated_dmc_accumulator(
        _stub_net, _make_le(charges), [atoms + 0.05])
    e_ref, displaced = acc(None, jax.random.PRNGKey(1), data, weights)
    assert np.isfinite(float(e_ref))
    assert np.isfinite(float(displaced[0]))


def test_constants_identity_outside_mesh():
    x = jnp.ones((4,))
    np.testing.assert_array_equal(np.asarray(constants.pmean(x)),
                                  np.asarray(x))
    np.testing.assert_array_equal(np.asarray(constants.psum(x)), np.asarray(x))


def test_constants_inside_shard_map():
    from jax.sharding import Mesh, PartitionSpec as P
    devices = np.asarray(jax.devices()[:4])
    mesh = Mesh(devices, ("data",))
    x = jnp.arange(8.0)

    def f(x):
        return constants.psum_if_bound(jnp.sum(x), "data")

    out = jax.shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P())(x)
    np.testing.assert_allclose(float(out), 28.0)
