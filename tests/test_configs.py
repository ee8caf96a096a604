"""Config modules + PBC/observables end-to-end smoke tests."""

import numpy as np
import pytest

from aiqmc_tpu import train
from aiqmc_tpu.configs import (atom, c2_ccecp, c2h4, c_atom_ccecp, ch4,
                               diamond, diatomic, h4, he2, heg, hn,
                               li_excited, li_wqmc, nh3, organic, hcl)


def test_atom_config():
    cfg = atom.get_config("C")
    assert cfg.system.spins.size == 6
    assert np.sum(cfg.system.spins > 0) == 4  # triplet ground state


def test_diatomic_configs():
    assert diatomic.h2().system.spins.size == 2
    assert diatomic.n2().system.spins.size == 14
    assert diatomic.c2().system.charges.tolist() == [6.0, 6.0]


def test_ch4_config():
    cfg = ch4.get_config()
    assert cfg.system.spins.size == 10
    assert cfg.optim.optimizer == "kfac"


def test_c_ccecp_config_runs(tmp_path):
    cfg = c_atom_ccecp.get_config()
    cfg.batch_size = 8
    cfg.optim.iterations = 1
    cfg.mcmc.steps = 1
    cfg.mcmc.burn_in = 1
    cfg.network.hidden_dims = ((8, 4),)
    cfg.network.hidden_dims_ynlm = (4,)
    cfg.debug.deterministic = True
    cfg.log.save_path = str(tmp_path)
    cfg.log.save_frequency = 1e9
    r = train.train(cfg)
    assert np.isfinite(r.energies).all()


def test_diamond_pbc_runs(tmp_path):
    cfg = diamond.get_config()
    cfg.batch_size = 8
    cfg.optim.iterations = 1
    cfg.mcmc.steps = 1
    cfg.mcmc.burn_in = 1
    cfg.network.hidden_dims = ((8, 4),)
    cfg.network.hidden_dims_ynlm = (4,)
    cfg.system.ewald.truncation_limit = 2
    cfg.debug.deterministic = True
    cfg.log.save_path = str(tmp_path)
    cfg.log.save_frequency = 1e9
    r = train.train(cfg)
    assert np.isfinite(r.energies).all()


def test_molecule_config_zoo():
    """Geometry/electron-count checks for the ferminet-parity config zoo."""
    assert h4.get_config().system.spins.size == 4
    assert hn.get_config(natoms=6).system.spins.size == 6
    assert he2.get_config().system.spins.size == 4
    assert nh3.get_config().system.spins.size == 10
    assert c2h4.get_config().system.spins.size == 16
    for name, n in [("bicbut", 30), ("cycbut-ground", 28)]:
        cfg = organic.get_config(name)
        assert cfg.system.spins.size == n
    cfg = li_excited.get_config()
    assert cfg.system.states == 3
    assert li_wqmc.get_config().optim.objective == "wqmc"
    cfg = c2_ccecp.get_config()
    assert cfg.system.use_pp and cfg.system.pp.rn_local.shape == (2, 3)
    assert cfg.system.spins.size == 8
    cfg = hcl.get_config()
    assert cfg.system.spins.size == 18 and cfg.system.states == 3


def test_heg_config_runs(tmp_path):
    cfg = heg.get_config(nelec=2)
    cfg.batch_size = 8
    cfg.optim.iterations = 1
    cfg.mcmc.steps = 1
    cfg.mcmc.burn_in = 1
    cfg.network.hidden_dims = ((8, 4),)
    cfg.network.hidden_dims_ynlm = (4,)
    cfg.system.ewald.truncation_limit = 2
    cfg.debug.deterministic = True
    cfg.log.save_path = str(tmp_path)
    cfg.log.save_frequency = 1e9
    r = train.train(cfg)
    assert np.isfinite(r.energies).all()


def test_multiwave_envelope_periodicity():
    """The multiwave envelope is invariant under lattice translations."""
    import jax.numpy as jnp
    from aiqmc_tpu.models import envelopes_zoo
    from aiqmc_tpu.pbc import kpoints as kpoints_lib
    lattice = 3.0 * np.eye(3)
    kpts = kpoints_lib.make_envelope_kpoints(lattice, 4)
    init, apply = envelopes_zoo.make_multiwave_envelope(kpts)
    params = init(natom=1, norb=6)
    params = {"sigma": params["sigma"] + 0.3 * np.random.RandomState(0)
              .standard_normal(params["sigma"].shape)}
    ae = jnp.asarray(np.random.RandomState(1).standard_normal((4, 1, 3)))
    shift = jnp.asarray(lattice[0] + 2 * lattice[2])
    out = apply(None, ae, params)
    out_shifted = apply(None, ae + shift, params)
    np.testing.assert_allclose(out, out_shifted, rtol=1e-5, atol=1e-5)


def test_observables_in_driver(tmp_path):
    cfg = diatomic.h2()
    cfg.batch_size = 8
    cfg.optim.iterations = 2
    cfg.mcmc.steps = 1
    cfg.mcmc.burn_in = 1
    cfg.network.hidden_dims = ((8, 4),)
    cfg.network.hidden_dims_ynlm = (4,)
    cfg.observables.s2 = True
    cfg.observables.dipole = True
    cfg.debug.deterministic = True
    cfg.log.save_path = str(tmp_path)
    cfg.log.save_frequency = 1e9
    r = train.train(cfg)
    assert np.isfinite(r.energies).all()
    import csv
    rows = list(csv.DictReader(open(f"{tmp_path}/train_states.csv")))
    # Ground-state observables land as 's2' and per-component dipole columns
    # (train.py writes dipole_{x,y,z}; state-matrix runs write dipole_d_ij).
    assert "s2" in rows[0]
    assert all(f"dipole_{d}" in rows[0] for d in "xyz")
    assert np.isfinite(float(rows[0]["s2"]))
