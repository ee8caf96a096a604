"""Config modules + PBC/observables end-to-end smoke tests."""

import numpy as np
import pytest

from aiqmc_tpu import train
from aiqmc_tpu.configs import atom, c_atom_ccecp, ch4, diamond, diatomic


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
    assert "s2" in rows[0] and "dipole" in rows[0]
    assert np.isfinite(float(rows[0]["s2"]))
