"""End-to-end training smoke tests on the 8-virtual-device CPU mesh
(pattern: ref ferminet/tests/train_test.py:51-113)."""

import numpy as np
import pytest

from aiqmc_tpu import config as config_lib
from aiqmc_tpu import train


def _h2_cfg():
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.array([[0.0, 0.0, -0.7], [0.0, 0.0, 0.7]])
        cfg.system.charges = np.array([1.0, 1.0])
        cfg.system.spins = np.array([1.0, -1.0])
        cfg.batch_size = 16
        cfg.optim.iterations = 3
        cfg.mcmc.steps = 3
        cfg.mcmc.burn_in = 3
        cfg.network.hidden_dims = ((8, 4), (8, 4))
        cfg.network.hidden_dims_ynlm = (4, 4)
        cfg.debug.deterministic = True
        cfg.log.save_frequency = 1e9
    return cfg


def test_h2_all_electron_adam(tmp_path):
    cfg = _h2_cfg()
    with cfg.unlocked():
        cfg.log.save_path = str(tmp_path)
    result = train.train(cfg)
    assert result.energies.shape == (3,)
    assert np.all(np.isfinite(result.energies))


def test_h2_lamb(tmp_path):
    """LAMB optimizer option (ref ferminet/train.py:749-755)."""
    cfg = _h2_cfg()
    with cfg.unlocked():
        cfg.optim.optimizer = "lamb"
        cfg.log.save_path = str(tmp_path)
    result = train.train(cfg)
    assert np.all(np.isfinite(result.energies))


def test_c_atom_ecp_adam(tmp_path):
    """C ccECP atom, reference example tables
    (ref example/single_atom_C/single_atom_C.py)."""
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.array([[0.0, 0.0, 0.0]])
        cfg.system.charges = np.array([4.0])
        cfg.system.spins = np.array([1.0, -1.0, 1.0, -1.0])
        cfg.system.use_pp = True
        cfg.system.pp.list_l = 2
        cfg.system.pp.rn_local = np.array([[1.0, 3.0, 2.0]])
        cfg.system.pp.local_coes = np.array([[4.00000, 57.74008, -25.81955]])
        cfg.system.pp.local_exps = np.array([[14.43502, 8.39889, 7.38188]])
        cfg.system.pp.rn_non_local = np.array([[[2.0, 2.0], [2.0, 2.0], [2.0, 2.0]]])
        cfg.system.pp.non_local_coes = np.array([[[52.13345, 0], [0, 0], [0, 0]]])
        cfg.system.pp.non_local_exps = np.array([[[7.76079, 0], [0, 0], [0, 0]]])
        cfg.batch_size = 16
        cfg.optim.iterations = 2
        cfg.mcmc.steps = 2
        cfg.mcmc.burn_in = 2
        cfg.network.hidden_dims = ((8, 4), (8, 4))
        cfg.network.hidden_dims_ynlm = (4, 4)
        cfg.debug.deterministic = True
        cfg.log.save_path = str(tmp_path)
        cfg.log.save_frequency = 1e9
    result = train.train(cfg)
    assert np.all(np.isfinite(result.energies))


def test_restore_resumes(tmp_path):
    cfg = _h2_cfg()
    with cfg.unlocked():
        cfg.log.save_path = str(tmp_path)
    train.train(cfg)
    # Second run restores from the same save_path and continues.
    cfg2 = _h2_cfg()
    with cfg2.unlocked():
        cfg2.log.save_path = str(tmp_path)
        cfg2.optim.iterations = 2
    result = train.train(cfg2)
    assert result.energies.shape == (2,)


@pytest.mark.parametrize("algorithm", ["random_walk"])
def test_h2_random_walk_sampler(tmp_path, algorithm):
    cfg = _h2_cfg()
    with cfg.unlocked():
        cfg.mcmc.algorithm = algorithm
        cfg.log.save_path = str(tmp_path)
    result = train.train(cfg)
    assert np.all(np.isfinite(result.energies))


def test_reference_keyword_api(tmp_path):
    """The reference main(...) keyword surface works end to end
    (ref main/main_pp_adam_muti_GPU.py:27-52)."""
    result = train.main(
        atoms=np.array([[0.0, 0.0, 0.0]]),
        charges=np.array([4.0]),
        spins=np.array([1.0, -1.0, 1.0, -1.0]),
        nelectrons=4, natoms=1, ndim=3,
        batch_size=16, iterations=2, tstep=0.05,
        nspins=(2, 2), nsteps=2, list_l=2,
        save_path=str(tmp_path), restore_path=None,
        save_frequency=1e9,
        structure=np.eye(3) * 10,
        Rn_local=np.array([[1.0, 3.0, 2.0]]),
        Local_coes=np.array([[4.00000, 57.74008, -25.81955]]),
        Local_exps=np.array([[14.43502, 8.39889, 7.38188]]),
        Rn_non_local=np.array([[[2.0, 2.0], [2.0, 2.0], [2.0, 2.0]]]),
        Non_local_coes=np.array([[[52.13345, 0], [0, 0], [0, 0]]]),
        Non_local_exps=np.array([[[7.76079, 0], [0, 0], [0, 0]]]),
        **{"mcmc.burn_in": 2,
           "network.hidden_dims": ((8, 4), (8, 4)),
           "network.hidden_dims_ynlm": (4, 4),
           "debug.deterministic": True})
    assert np.all(np.isfinite(result.energies))


def test_fstream_ecp_kfac_forward_laplacian(tmp_path):
    """Arm-C path: upstream-FermiNet h-stream + ccECP + native KFAC + forward
    Laplacian end to end (scripts/run_c_ccecp_kfac_fstream.py wiring)."""
    from aiqmc_tpu.configs import c_atom_ccecp

    cfg = c_atom_ccecp.get_config()
    with cfg.unlocked():
        cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
        cfg.batch_size = 16
        cfg.network.hidden_dims = ((8, 4), (8, 4))
        cfg.network.hidden_dims_ynlm = (4, 4)
        cfg.network.determinants = 2
        cfg.network.h_stream = "ferminet"
        cfg.optim.optimizer = "kfac"
        cfg.optim.laplacian = "forward"
        cfg.optim.iterations = 2
        cfg.optim.ema_decay = 0.99
        cfg.system.pp.quadrature = "icosahedral12"
        cfg.pretrain.iterations = 2
        cfg.mcmc.steps = 1
        cfg.mcmc.burn_in = 1
        cfg.debug.deterministic = True
        cfg.log.save_path = str(tmp_path)
        cfg.log.save_frequency = 1e9
    result = train.train(cfg)
    assert np.all(np.isfinite(result.energies))


def test_h2_complex_pairs_spring(tmp_path):
    """Complex-pair SPRING through train.train (stacked-jacobian MinSR)."""
    cfg = _h2_cfg()
    with cfg.unlocked():
        cfg.network.complex_orbitals = True
        cfg.network.complex_pairs = True
        cfg.optim.optimizer = "spring"
        cfg.log.save_path = str(tmp_path)
    result = train.train(cfg)
    assert np.all(np.isfinite(result.energies))


def test_diamond_twist_forward_pair_laplacian(tmp_path):
    """Twisted complex-pairs diamond with the forward pair Laplacian end to
    end (the PBC production wiring once scripts/probe_forward_pair.py passes
    on the chip): twist_k threads train._build_local_energy -> pp_pbc ->
    make_forward_kinetic_pair."""
    from aiqmc_tpu.configs import diamond_ccecp

    cfg = diamond_ccecp.get_config()
    with cfg.unlocked():
        cfg.batch_size = 8
        cfg.network.hidden_dims = ((8, 4),)
        cfg.network.hidden_dims_ynlm = (4,)
        cfg.network.determinants = 2
        cfg.network.complex_orbitals = True
        cfg.network.complex_pairs = True
        cfg.system.twist = (0.25, -0.25, 0.25)
        cfg.optim.laplacian = "forward"
        cfg.optim.optimizer = "adam"
        cfg.optim.iterations = 2
        cfg.mcmc.steps = 1
        cfg.mcmc.burn_in = 1
        cfg.pretrain.iterations = 0
        cfg.debug.deterministic = True
        cfg.log.save_path = str(tmp_path)
        cfg.log.save_frequency = 1e9
    result = train.train(cfg)
    assert np.all(np.isfinite(result.energies))


def test_psiformer_ecp_kfac_forward_laplacian(tmp_path):
    """Arm-D path: PsiFormer ansatz + ccECP + native KFAC + forward Laplacian
    end to end (scripts/run_c_ccecp_psiformer.py uses exactly this wiring)."""
    from aiqmc_tpu.configs import c_atom_ccecp

    cfg = c_atom_ccecp.get_config()
    with cfg.unlocked():
        cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
        cfg.batch_size = 16
        cfg.network.network_type = "psiformer"
        cfg.network.psiformer.num_layers = 1
        cfg.network.psiformer.num_heads = 2
        cfg.network.psiformer.heads_dim = 4
        cfg.network.psiformer.mlp_hidden_dims = (8,)
        cfg.network.determinants = 2
        cfg.optim.optimizer = "kfac"
        cfg.optim.laplacian = "forward"
        cfg.optim.iterations = 2
        cfg.optim.ema_decay = 0.99
        cfg.system.pp.quadrature = "icosahedral12"
        cfg.pretrain.iterations = 2
        cfg.mcmc.steps = 1
        cfg.mcmc.burn_in = 1
        cfg.debug.deterministic = True
        cfg.log.save_path = str(tmp_path)
        cfg.log.save_frequency = 1e9
    result = train.train(cfg)
    assert np.all(np.isfinite(result.energies))


def test_h2_forces_observable(tmp_path):
    """cfg.observables.forces logs force_{a}_{x,y,z} columns (AD-SWCT
    estimator, forces.py) with the translation sum rule holding per logged
    row and z-antisymmetry across the two H atoms by symmetry of the mean."""
    import csv

    cfg = _h2_cfg()
    with cfg.unlocked():
        cfg.observables.forces = True
        cfg.log.save_path = str(tmp_path)
        cfg.log.stats_frequency = 1
    result = train.train(cfg)
    assert np.all(np.isfinite(result.energies))
    with open(f"{result.ckpt_save_path}/train_states.csv") as f:
        rows = list(csv.DictReader(f))
    cols = [f"force_{a}_{d}" for a in range(2) for d in "xyz"]
    for c in cols:
        assert c in rows[0], f"missing column {c}"
    vals = np.array([[float(r[c]) for c in cols] for r in rows])
    assert np.all(np.isfinite(vals))
    # Translation sum rule: sum over atoms of the batch-mean force is 0.
    np.testing.assert_allclose(vals[:, :3] + vals[:, 3:], 0.0, atol=1e-3)
