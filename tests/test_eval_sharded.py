"""Eval drivers under GSPMD: sharded == single-device.

The reference parallelises its eval/correlated-sample drivers with pmap
(ref AIQMCrelease3/constants.py:5-9); ours run the same batched programs
under GSPMD over the 1-D walker mesh. Per-walker physics is independent of
the sharding, so an 8-device run must reproduce the 1-device run exactly
(up to reduction-order rounding) with identical PRNG keys.
"""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import vmc_eval
from aiqmc_tpu.dmc import correlated as dmc_corr
from aiqmc_tpu.hamiltonian import local_energy as ae
from aiqmc_tpu.models import network as nn, spin_indices
from aiqmc_tpu.parallel import mesh as mesh_lib

BATCH = 16


def _h2_setup():
    spins = np.array([1.0, -1.0])
    atoms = jnp.array([[0.0, 0.0, -0.7], [0.0, 0.0, 0.7]])
    charges = jnp.array([1.0, 1.0])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, 2)
    up, down = spin_indices.spin_indices_h(spins)
    net = nn.make_ai_net(
        nspins=(1, 1), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=2,
        nelectrons=2, determinants=2, hidden_dims=((8, 4), (8, 4)),
        hidden_dims_Ynlm=(4, 4))
    params = net.init(jax.random.PRNGKey(0))
    pos = 0.8 * jax.random.normal(jax.random.PRNGKey(1), (BATCH, 6))
    data = nn.AINetData(positions=pos, spins=jnp.asarray(spins), atoms=atoms,
                        charges=charges)
    return net, params, data, charges, atoms


def test_evaluate_energy_sharded_matches_single_device():
    assert jax.device_count() >= 8
    net, params, data, charges, _ = _h2_setup()
    le = ae.local_energy(net.apply, charges, (1, 1))
    key = jax.random.PRNGKey(3)

    p8, d8, mesh8 = vmc_eval.distribute(params, data)
    assert mesh8.devices.size == jax.device_count()
    m8, el8 = vmc_eval.evaluate_energy(le, p8, key, d8)
    assert len(el8.sharding.device_set) == jax.device_count()

    mesh1 = mesh_lib.make_mesh(jax.devices()[:1])
    p1, d1, _ = vmc_eval.distribute(params, data, mesh1)
    m1, el1 = vmc_eval.evaluate_energy(le, p1, key, d1)

    np.testing.assert_allclose(np.asarray(el8), np.asarray(el1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m8.real), float(m1.real),
                               rtol=1e-5, atol=1e-6)


def test_correlated_sweep_sharded_matches_single_device():
    net, params, data, charges, atoms = _h2_setup()

    def make_le(_atoms):
        return ae.local_energy(net.apply, charges, (1, 1))

    new_atoms = jnp.array([[0.0, 0.0, -0.75], [0.0, 0.0, 0.75]])
    key = jax.random.PRNGKey(5)
    e_ref8, es8 = vmc_eval.correlated_energy_sweep(
        net.apply, make_le, params, key, data, [new_atoms])
    mesh1 = mesh_lib.make_mesh(jax.devices()[:1])
    e_ref1, es1 = vmc_eval.correlated_energy_sweep(
        net.apply, make_le, params, key, data, [new_atoms], mesh=mesh1)
    np.testing.assert_allclose(float(e_ref8.real), float(e_ref1.real),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(es8[0].real), float(es1[0].real),
                               rtol=1e-5, atol=1e-6)


def test_dmc_correlated_accumulator_sharded_matches_single_device():
    net, params, data, charges, atoms = _h2_setup()

    def make_le(_atoms):
        return ae.local_energy(net.apply, charges, (1, 1))

    new_atoms = jnp.array([[0.0, 0.0, -0.75], [0.0, 0.0, 0.75]])
    acc = dmc_corr.make_correlated_dmc_accumulator(
        net.apply, make_le, [new_atoms])
    weights = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(6), (BATCH,))
    key = jax.random.PRNGKey(7)

    mesh8 = mesh_lib.walker_mesh(BATCH)
    p8, d8, _ = vmc_eval.distribute(params, data, mesh8)
    w8 = jax.device_put(weights, mesh_lib.data_sharding(mesh8))
    e8, disp8 = acc(p8, key, d8, w8)

    mesh1 = mesh_lib.make_mesh(jax.devices()[:1])
    p1, d1, _ = vmc_eval.distribute(params, data, mesh1)
    w1 = jax.device_put(weights, mesh_lib.data_sharding(mesh1))
    e1, disp1 = acc(p1, key, d1, w1)

    np.testing.assert_allclose(float(e8), float(e1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(disp8[0]), float(disp1[0]),
                               rtol=1e-5, atol=1e-6)
