"""Multi-device DMC: the driver shards walkers over the mesh and the sharded
run is equivalent to the single-device run.

The reference's DMC is data-parallel (pmap dispatch of propagation and the
per-device total energy, ref AIQMCrelease3/DMC/main_dmc.py:97-114,169-175);
our driver runs the same programs under GSPMD on a 1-D Mesh(('data',)).
These tests exercise that path on the 8-virtual-CPU-device mesh:

  * driver.main on the full mesh leaves the walker population sharded over
    the 'data' axis and produces finite block energies;
  * with identical PRNG keys, the 8-device and 1-device runs produce the
    same block-energy trace (per-walker physics is sharding-invariant; the
    only cross-shard ops are the weight reductions and the branching comb).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiqmc_tpu import config as config_lib
from aiqmc_tpu import train
from aiqmc_tpu.dmc import driver
from aiqmc_tpu.parallel import mesh as mesh_lib

PP = dict(
    Rn_local=np.array([[1.0, 3.0, 2.0]]),
    Local_coes=np.array([[4.00000, 57.74008, -25.81955]]),
    Local_exps=np.array([[14.43502, 8.39889, 7.38188]]),
    Rn_non_local=np.array([[[2.0, 2.0], [2.0, 2.0], [2.0, 2.0]]]),
    Non_local_coes=np.array([[[52.13345, 0], [0, 0], [0, 0]]]),
    Non_local_exps=np.array([[[7.76079, 0], [0, 0], [0, 0]]]))

NETWORK_KWARGS = {"hidden_dims": ((8, 4), (8, 4)),
                  "hidden_dims_Ynlm": (4, 4),
                  "full_equivariance": True,
                  "complex_orbitals": False}


@pytest.fixture(scope="module")
def vmc_ckpt(tmp_path_factory):
    """One tiny C-ccECP VMC checkpoint shared by both DMC runs."""
    path = tmp_path_factory.mktemp("vmc_trial")
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.array([[0.0, 0.0, 0.0]])
        cfg.system.charges = np.array([4.0])
        cfg.system.spins = np.array([1.0, -1.0, 1.0, -1.0])
        cfg.system.use_pp = True
        cfg.system.pp.rn_local = PP["Rn_local"]
        cfg.system.pp.local_coes = PP["Local_coes"]
        cfg.system.pp.local_exps = PP["Local_exps"]
        cfg.system.pp.rn_non_local = PP["Rn_non_local"]
        cfg.system.pp.non_local_coes = PP["Non_local_coes"]
        cfg.system.pp.non_local_exps = PP["Non_local_exps"]
        cfg.batch_size = 16
        cfg.optim.iterations = 1
        cfg.mcmc.steps = 2
        cfg.mcmc.burn_in = 2
        cfg.network.hidden_dims = NETWORK_KWARGS["hidden_dims"]
        cfg.network.hidden_dims_ynlm = NETWORK_KWARGS["hidden_dims_Ynlm"]
        cfg.debug.deterministic = True
        cfg.log.save_path = str(path)
        cfg.log.save_frequency = 1e9
    train.train(cfg)
    return str(path)


def _run_dmc(vmc_ckpt, save_path, mesh):
    return driver.main(
        atoms=np.array([[0.0, 0.0, 0.0]]), charges=np.array([4.0]),
        spins=np.array([1.0, -1.0, 1.0, -1.0]), tstep=0.02, nelectrons=4,
        nsteps=1, natoms=1, ndim=3, batch_size=16, iterations=2, nblocks=2,
        feedback=1.0, nspins=(2, 2), save_path=save_path,
        restore_path=vmc_ckpt, save_frequency=1e9, seed=7,
        network_kwargs=dict(NETWORK_KWARGS), mesh=mesh, **PP)


def test_dmc_walkers_sharded_over_mesh(vmc_ckpt, tmp_path):
    """Default mesh = all 8 virtual devices; the returned population must
    still be sharded on the 'data' axis and the physics finite."""
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    energies, data, weights = _run_dmc(vmc_ckpt, str(tmp_path), mesh=None)
    assert energies.shape == (2,)
    assert np.all(np.isfinite(energies))
    # Walkers ended the run distributed over every device of the mesh.
    assert len(data.positions.sharding.device_set) == jax.device_count()
    assert len(weights.sharding.device_set) == jax.device_count()
    np.testing.assert_allclose(np.asarray(jnp.sum(weights)), 16.0, rtol=0.5)


def test_dmc_sharded_matches_single_device(vmc_ckpt, tmp_path):
    """Same keys, same trial: 8-device GSPMD run == 1-device run.

    Per-walker propagation and energies are independent of the sharding; the
    cross-shard collectives (weight means, comb cumsum/searchsorted, the
    branch gather) must reproduce the single-device semantics. Tolerance
    covers reduction-order rounding only."""
    e8, d8, w8 = _run_dmc(vmc_ckpt, str(tmp_path / "m8"), mesh=None)
    mesh1 = mesh_lib.make_mesh(jax.devices()[:1])
    e1, d1, w1 = _run_dmc(vmc_ckpt, str(tmp_path / "m1"), mesh=mesh1)
    np.testing.assert_allclose(e8, e1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w8), np.asarray(w1),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d8.positions),
                               np.asarray(d1.positions),
                               rtol=1e-4, atol=1e-5)
