"""Excited-state (NES-VMC) end-to-end smoke: 2-state hydrogen.

The total ansatz det[psi_i(x_j)] optimised with the ordinary VMC loss must
descend toward E_total = E_1s + E_2p = -0.625 Ha (validated to -0.58 in a
longer run; this smoke checks the machinery descends and stays variational).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aiqmc_tpu import loss as loss_lib
from aiqmc_tpu.hamiltonian import excited as exc_ham
from aiqmc_tpu.models import excited, network as nn, spin_indices
from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.sampling import mcmc as rw


def test_nes_vmc_hydrogen_two_states():
    spins = np.array([1.0])
    nel, states = 1, 2
    atoms = jnp.zeros((1, 3))
    charges = jnp.array([1.0])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nel)
    up, down = spin_indices.spin_indices_h(spins)
    base = nn.make_ai_net(
        nspins=(1, 0), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=1,
        nelectrons=nel, full_equivariance=True, complex_orbitals=False,
        bounded_envelope=True, regular_harmonics=True,
        hidden_dims=((8, 4), (8, 4)), hidden_dims_Ynlm=(4, 4))
    init, apply = excited.make_total_ansatz(base, states)
    params = init(jax.random.PRNGKey(0))

    el = exc_ham.local_energy(apply, charges, (1, 0), states=states,
                              nelectrons=nel)
    loss_network = lambda p, x, s, a, c: apply(p, x, s, a, c)[1]
    evaluate_loss = loss_lib.make_loss(loss_network, el, clip_local_energy=5.0,
                                       clip_from_median=True)
    batch = 128
    key = jax.random.PRNGKey(1)
    pos = jax.random.normal(key, (batch, states * 3)) * 2.0
    data = AINetData(positions=pos, spins=jnp.asarray(spins), atoms=atoms,
                     charges=charges)
    batch_net = jax.vmap(loss_network, in_axes=(None, 0, None, None, None))
    mc = rw.make_mcmc_step(batch_net, batch, steps=10)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, data, key):
        k1, k2 = jax.random.split(key)
        data, _ = mc(params, data, k1, 0.4)
        (lv, _), g = jax.value_and_grad(evaluate_loss, has_aux=True)(
            params, k2, data)
        upd, opt_state = optimizer.update(g, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, opt_state, data, lv

    losses = []
    for _ in range(120):
        key, sk = jax.random.split(key)
        params, opt_state, data, lv = step(params, opt_state, data, sk)
        losses.append(float(lv))
    tail = np.mean(losses[-20:])
    assert np.isfinite(tail)
    # descending toward -0.625; must beat a loose threshold and respect the
    # variational bound (tail above the exact total with MC slack).
    assert tail < -0.25, tail
    assert tail > -0.75, tail


def test_energy_matrix_trace_equals_total_ansatz_local_energy():
    """tr(M^-1 HM) == E_L of det(M) exactly (det is linear in each row)."""
    spins = np.array([1.0, -1.0])
    nel, states = 2, 2
    atoms = jnp.zeros((1, 3))
    charges = jnp.array([2.0])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nel)
    up, down = spin_indices.spin_indices_h(spins)
    base = nn.make_ai_net(
        nspins=(1, 1), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=1,
        nelectrons=nel, full_equivariance=True, complex_orbitals=False,
        bounded_envelope=True, regular_harmonics=True,
        hidden_dims=((8, 4), (8, 4)), hidden_dims_Ynlm=(4, 4))
    init, apply = excited.make_total_ansatz(base, states)
    params = init(jax.random.PRNGKey(0))

    el_total = exc_ham.local_energy(apply, charges, (1, 1), states=states,
                                    nelectrons=nel)
    el_mat = exc_ham.local_energy_matrix(base.orbitals, charges,
                                         states=states, nelectrons=nel)

    key = jax.random.PRNGKey(5)
    for i in range(3):
        pos = jax.random.normal(jax.random.fold_in(key, i),
                                (states * nel * 3,))
        data = AINetData(positions=pos, spins=jnp.asarray(spins), atoms=atoms,
                         charges=charges)
        e_tot, _ = el_total(params, None, data)
        e_tr, mat = el_mat(params, None, data)
        assert mat.shape == (states, states)
        np.testing.assert_allclose(float(e_tr), float(e_tot), rtol=1e-4)


def test_train_driver_excited_states_smoke():
    """cfg.system.states=2 end-to-end: per-state energy columns in the CSV."""
    import tempfile
    from aiqmc_tpu import config as config_lib, train

    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.array([[0.0, 0.0, 0.0]])
        cfg.system.charges = np.array([1.0])
        cfg.system.spins = np.array([1.0])
        cfg.system.states = 2
        cfg.batch_size = 16
        cfg.optim.iterations = 2
        cfg.optim.optimizer = "adam"
        cfg.mcmc.steps = 2
        cfg.mcmc.burn_in = 2
        cfg.network.hidden_dims = ((8, 4), (8, 4))
        cfg.network.hidden_dims_ynlm = (4, 4)
        cfg.debug.deterministic = True
        cfg.log.save_frequency = 1e9
    with tempfile.TemporaryDirectory() as tmp:
        with cfg.unlocked():
            cfg.log.save_path = tmp
        result = train.train(cfg)
        import csv, os
        with open(os.path.join(result.ckpt_save_path,
                               "train_states.csv")) as f:
            rows = list(csv.DictReader(f))
    assert np.all(np.isfinite(result.energies))
    assert "energy_state_0" in rows[0] and "energy_state_1" in rows[0]
    # trace identity: sum of per-state energies ~ total (same batch)
    tot = float(rows[-1]["energy"])
    parts = float(rows[-1]["energy_state_0"]) + float(rows[-1]["energy_state_1"])
    np.testing.assert_allclose(parts, tot, rtol=1e-3, atol=1e-3)


def _base_net(nel, nspins, spins, charges, determinants):
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nel)
    up, down = spin_indices.spin_indices_h(spins)
    return nn.make_ai_net(
        nspins=nspins, charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=1,
        nelectrons=nel, full_equivariance=True, complex_orbitals=False,
        bounded_envelope=True, regular_harmonics=True,
        determinants=determinants, hidden_dims=((8, 4), (8, 4)),
        hidden_dims_Ynlm=(4, 4))


def test_shared_energy_matrix_trace_equals_total_ansatz():
    """Shared construction: tr(M^-1 HM) == E_L of det(M) exactly, with the
    kinetic of every state from ONE forward-Laplacian pass per config."""
    spins = np.array([1.0, -1.0])
    nel, states, ndets = 2, 2, 3
    atoms = jnp.zeros((1, 3))
    charges = jnp.array([2.0])
    base = _base_net(nel, (1, 1), spins, charges, states * ndets)
    init, apply = excited.make_shared_total_ansatz(base, states)
    params = init(jax.random.PRNGKey(0))

    el_total = exc_ham.local_energy(apply, charges, (1, 1), states=states,
                                    nelectrons=nel)
    el_mat = exc_ham.local_energy_matrix_shared(
        base.orbitals, charges, states=states, nelectrons=nel)

    key = jax.random.PRNGKey(5)
    for i in range(3):
        pos = jax.random.normal(jax.random.fold_in(key, i),
                                (states * nel * 3,))
        data = AINetData(positions=pos, spins=jnp.asarray(spins), atoms=atoms,
                         charges=charges)
        e_tot, _ = el_total(params, None, data)
        e_tr, mat = el_mat(params, None, data)
        assert mat.shape == (states, states)
        np.testing.assert_allclose(float(e_tr), float(e_tot), rtol=1e-4)


def test_shared_state_matrix_equals_group_slices():
    """psi_i from the shared state matrix == logdet_matmul over determinant
    group i evaluated by hand."""
    from aiqmc_tpu.models import blocks
    spins = np.array([1.0, -1.0])
    nel, states, ndets = 2, 3, 2
    atoms = jnp.zeros((1, 3))
    charges = jnp.array([2.0])
    base = _base_net(nel, (1, 1), spins, charges, states * ndets)
    init, sm_apply = excited.make_shared_state_matrix(base, states)
    params = init(jax.random.PRNGKey(1))
    positions = jax.random.normal(jax.random.PRNGKey(2), (states * nel * 3,))
    signs, logs = sm_apply(params, positions, jnp.asarray(spins), atoms,
                           charges)
    assert signs.shape == (states, states)
    configs = positions.reshape(states, -1)
    for j in range(states):
        dets, = base.orbitals(params, configs[j], jnp.asarray(spins), atoms,
                              charges)
        for i in range(states):
            s, l = blocks.logdet_matmul([dets[i * ndets:(i + 1) * ndets]])
            np.testing.assert_allclose(float(logs[i, j]), float(l), rtol=1e-6)
            np.testing.assert_allclose(float(signs[i, j]), float(s))


def test_shared_params_are_K_times_smaller():
    """The point of the re-architecture: one tree ~ 1/K the parameter count
    of the legacy K-copy construction (same per-state determinants)."""
    spins = np.array([1.0, -1.0])
    nel, states, ndets = 2, 3, 2
    charges = jnp.array([2.0])
    base_shared = _base_net(nel, (1, 1), spins, charges, states * ndets)
    base_legacy = _base_net(nel, (1, 1), spins, charges, ndets)
    shared_init, _ = excited.make_shared_total_ansatz(base_shared, states)
    legacy_init, _ = excited.make_total_ansatz(base_legacy, states)
    count = lambda t: sum(x.size for x in jax.tree_util.tree_leaves(t))
    n_shared = count(shared_init(jax.random.PRNGKey(0)))
    n_legacy = count(legacy_init(jax.random.PRNGKey(0)))
    # Shared layers dominate; only the orbital head scales with K.
    assert n_shared < 0.6 * n_legacy, (n_shared, n_legacy)


def test_train_driver_shared_states_kfac_smoke():
    """Shared-parameter excited states must train under the native KFAC (one
    layer registry; the legacy K-copy mode gave KFAC K disjoint dense sets)."""
    import tempfile
    from aiqmc_tpu import config as config_lib, train

    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.array([[0.0, 0.0, 0.0]])
        cfg.system.charges = np.array([1.0])
        cfg.system.spins = np.array([1.0])
        cfg.system.states = 2
        cfg.batch_size = 16
        cfg.optim.iterations = 2
        cfg.optim.optimizer = "kfac"
        cfg.mcmc.steps = 2
        cfg.mcmc.burn_in = 2
        cfg.network.hidden_dims = ((8, 4), (8, 4))
        cfg.network.hidden_dims_ynlm = (4, 4)
        cfg.debug.deterministic = True
        cfg.log.save_frequency = 1e9
    with tempfile.TemporaryDirectory() as tmp:
        with cfg.unlocked():
            cfg.log.save_path = tmp
        result = train.train(cfg)
    assert np.all(np.isfinite(result.energies))


def test_train_driver_states_observables_csv():
    """With cfg.observables.{s2,dipole} on an excited-state run, the train
    loop must log the FULL NES-VMC state matrices (per-state diagonal +
    transition elements) as s2_ij / dipole_d_ij CSV columns (ref
    ferminet/observables.py:152-274 supports states; a scalar column would
    silently average garbage over the extended configuration)."""
    import csv
    import os
    import tempfile
    from aiqmc_tpu import config as config_lib, train

    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.array([[0.0, 0.0, 0.0]])
        cfg.system.charges = np.array([2.0])
        cfg.system.spins = np.array([1.0, -1.0])
        cfg.system.states = 2
        cfg.batch_size = 16
        cfg.optim.iterations = 2
        cfg.optim.optimizer = "adam"
        cfg.mcmc.steps = 2
        cfg.mcmc.burn_in = 2
        cfg.network.hidden_dims = ((8, 4), (8, 4))
        cfg.network.hidden_dims_ynlm = (4, 4)
        cfg.observables.s2 = True
        cfg.observables.dipole = True
        cfg.debug.deterministic = True
        cfg.log.save_frequency = 1e9
        cfg.log.stats_frequency = 1
    with tempfile.TemporaryDirectory() as tmp:
        with cfg.unlocked():
            cfg.log.save_path = tmp
        train.train(cfg)
        with open(os.path.join(tmp, "train_states.csv")) as f:
            rows = list(csv.DictReader(f))
    want_cols = [f"s2_{i}{j}" for i in range(2) for j in range(2)]
    want_cols += [f"dipole_{d}_{i}{j}" for d in "xyz"
                  for i in range(2) for j in range(2)]
    want_cols += [f"energy_mat_{i}{j}" for i in range(2) for j in range(2)]
    assert rows, "no stats rows written"
    for col in want_cols:
        assert col in rows[-1], f"missing observable column {col}"
        assert np.isfinite(float(rows[-1][col])), (col, rows[-1][col])


def test_train_driver_legacy_param_copies_flag():
    """cfg.system.excited_param_copies=True selects the K-copy construction:
    params restore as a list of K trees (legacy checkpoints stay loadable)."""
    import tempfile
    from aiqmc_tpu import config as config_lib, train

    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.array([[0.0, 0.0, 0.0]])
        cfg.system.charges = np.array([1.0])
        cfg.system.spins = np.array([1.0])
        cfg.system.states = 2
        cfg.system.excited_param_copies = True
        cfg.batch_size = 16
        cfg.optim.iterations = 2
        cfg.optim.optimizer = "adam"
        cfg.mcmc.steps = 2
        cfg.mcmc.burn_in = 2
        cfg.network.hidden_dims = ((8, 4), (8, 4))
        cfg.network.hidden_dims_ynlm = (4, 4)
        cfg.debug.deterministic = True
        cfg.log.save_frequency = 1e9
    with tempfile.TemporaryDirectory() as tmp:
        with cfg.unlocked():
            cfg.log.save_path = tmp
        result = train.train(cfg)
    assert isinstance(result.params, list) and len(result.params) == 2
    assert np.all(np.isfinite(result.energies))
