"""DMC engine tests: branching statistics, S-matrix, end-to-end smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiqmc_tpu.dmc import branch as branch_lib
from aiqmc_tpu.dmc import s_matrix
from aiqmc_tpu.models.network import AINetData


def test_branch_conserves_population_and_weight():
    n = 64
    key = jax.random.PRNGKey(0)
    weights = jax.random.uniform(key, (n,)) * 2.0
    data = AINetData(positions=jnp.arange(n * 6, dtype=jnp.float32).reshape(n, 6),
                     spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    new_data, new_weights, inds = branch_lib.branch(data, weights, key)
    assert new_data.positions.shape == data.positions.shape
    np.testing.assert_allclose(np.asarray(new_weights),
                               float(jnp.sum(weights)) / n, rtol=1e-5)
    # every resampled walker must be a copy of an original one
    orig = np.asarray(data.positions)
    new = np.asarray(new_data.positions)
    for row in new:
        assert (row == orig).all(axis=1).any()


def test_branch_favours_heavy_walkers():
    """A walker with overwhelming weight should dominate the resample."""
    n = 32
    weights = jnp.ones((n,)).at[3].set(1000.0)
    data = AINetData(positions=jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3),
                     spins=jnp.array([1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    _, _, inds = branch_lib.branch(data, weights, jax.random.PRNGKey(1))
    counts = np.bincount(np.asarray(inds), minlength=n)
    assert counts[3] >= n - 2


def test_s_matrix_limits():
    """With eloc == e_est, S == e_trial - e_est regardless of drift."""
    v2 = jnp.ones((4, 6))
    s = s_matrix.comput_S(e_trial=-1.0, e_est=-1.1, branchcut=10.0, v2=v2,
                          tau=0.01, eloc=jnp.full((4,), -1.1), nelec=2)
    np.testing.assert_allclose(np.asarray(s), 0.1, rtol=1e-5)


def test_s_matrix_branchcut_clamps():
    v2 = jnp.zeros((1, 6))
    s = s_matrix.comput_S(e_trial=0.0, e_est=0.0, branchcut=0.5, v2=v2,
                          tau=0.01, eloc=jnp.array([-100.0]), nelec=2)
    np.testing.assert_allclose(np.asarray(s), 0.5, rtol=1e-5)


def test_dmc_end_to_end(tmp_path):
    """VMC checkpoint -> short DMC run; energies stay finite and population is
    controlled (pattern: ref DMC/main_dmc.py)."""
    from aiqmc_tpu import config as config_lib
    from aiqmc_tpu import train
    from aiqmc_tpu.dmc import driver

    pp = dict(
        Rn_local=np.array([[1.0, 3.0, 2.0]]),
        Local_coes=np.array([[4.00000, 57.74008, -25.81955]]),
        Local_exps=np.array([[14.43502, 8.39889, 7.38188]]),
        Rn_non_local=np.array([[[2.0, 2.0], [2.0, 2.0], [2.0, 2.0]]]),
        Non_local_coes=np.array([[[52.13345, 0], [0, 0], [0, 0]]]),
        Non_local_exps=np.array([[[7.76079, 0], [0, 0], [0, 0]]]))

    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.array([[0.0, 0.0, 0.0]])
        cfg.system.charges = np.array([4.0])
        cfg.system.spins = np.array([1.0, -1.0, 1.0, -1.0])
        cfg.system.use_pp = True
        cfg.system.pp.rn_local = pp["Rn_local"]
        cfg.system.pp.local_coes = pp["Local_coes"]
        cfg.system.pp.local_exps = pp["Local_exps"]
        cfg.system.pp.rn_non_local = pp["Rn_non_local"]
        cfg.system.pp.non_local_coes = pp["Non_local_coes"]
        cfg.system.pp.non_local_exps = pp["Non_local_exps"]
        cfg.batch_size = 16
        cfg.optim.iterations = 1
        cfg.mcmc.steps = 2
        cfg.mcmc.burn_in = 2
        cfg.network.hidden_dims = ((8, 4), (8, 4))
        cfg.network.hidden_dims_ynlm = (4, 4)
        cfg.debug.deterministic = True
        cfg.log.save_path = str(tmp_path)
        cfg.log.save_frequency = 1e9
    train.train(cfg)

    energies, data, weights = driver.main(
        atoms=np.array([[0.0, 0.0, 0.0]]), charges=np.array([4.0]),
        spins=np.array([1.0, -1.0, 1.0, -1.0]), tstep=0.02, nelectrons=4,
        nsteps=1, natoms=1, ndim=3, batch_size=16, iterations=2, nblocks=2,
        feedback=1.0, nspins=(2, 2), save_path=str(tmp_path), restore_path=None,
        save_frequency=1e9,
        network_kwargs={"hidden_dims": ((8, 4), (8, 4)),
                        "hidden_dims_Ynlm": (4, 4),
                        "full_equivariance": True,
                        "complex_orbitals": False},
        **pp)
    assert energies.shape == (2,)
    assert np.all(np.isfinite(energies))
    assert np.all(np.isfinite(np.asarray(weights)))

    # Same driver argv path with the forward-Laplacian kinetic (the ~2x DMC
    # lever): must restore the same trial, build network.orbitals, and stay
    # finite end-to-end.
    energies_f, _, weights_f = driver.main(
        atoms=np.array([[0.0, 0.0, 0.0]]), charges=np.array([4.0]),
        spins=np.array([1.0, -1.0, 1.0, -1.0]), tstep=0.02, nelectrons=4,
        nsteps=1, natoms=1, ndim=3, batch_size=16, iterations=2, nblocks=2,
        feedback=1.0, nspins=(2, 2), save_path=str(tmp_path), restore_path=None,
        save_frequency=1e9, laplacian="forward",
        network_kwargs={"hidden_dims": ((8, 4), (8, 4)),
                        "hidden_dims_Ynlm": (4, 4),
                        "full_equivariance": True,
                        "complex_orbitals": False},
        **pp)
    assert np.all(np.isfinite(np.asarray(energies_f)))
    assert np.all(np.isfinite(np.asarray(weights_f)))


def test_dmc_projects_hydrogen_to_exact():
    """DMC from a deliberately wrong hydrogen trial (alpha=0.8, VMC -0.48 Ha)
    must project the mixed estimator to the exact -0.5 Ha (nodeless system;
    remaining deviation is the finite-time-step bias)."""
    from aiqmc_tpu.dmc.propagate import dmc_propagate, calculate_total_energy
    from aiqmc_tpu.hamiltonian import local_energy as ae

    alpha = 0.8

    def psi(params, pos, spins, atoms, charges):
        return jnp.ones(()), -alpha * jnp.linalg.norm(pos)

    batch, tstep = 512, 0.03
    run = (dmc_propagate(
        signed_network=psi, log_network=None, logabs_f=None, list_l=0,
        nelectrons=1, natoms=1, ndim=3, batch_size=batch, tstep=tstep,
        nsteps=1, charges=jnp.array([1.0]), spins=(1, 0), Rn_local=None,
        Local_coes=None, Local_exps=None, Rn_non_local=None,
        Non_local_coes=None, Non_local_exps=None))
    jb = jax.jit(branch_lib.branch)
    key = jax.random.PRNGKey(0)
    data = AINetData(positions=jax.random.normal(key, (batch, 3)),
                     spins=jnp.array([1.0]), atoms=jnp.zeros((1, 3)),
                     charges=jnp.array([1.0]))
    el = ae.local_energy(psi, jnp.array([1.0]), (1, 0))
    tot = jax.jit(calculate_total_energy(el))
    _, (e0, var0) = tot(None, key, data)
    e_trial = e_est = e0
    weights = jnp.ones((batch,))
    es = []
    for t in range(300):
        key, sk, bk = jax.random.split(key, 3)
        energy, weights, data = run(None, sk, data, weights,
                                    10.0 * jnp.sqrt(var0), e_trial, e_est)
        w = weights / jnp.sum(weights)
        e_est = jnp.sum(energy.real * w)
        es.append(float(e_est))
        if t % 5 == 4:
            data, weights, _ = jb(data, weights, bk)
        e_trial = e_est - 0.3 * jnp.log(jnp.mean(weights)).real
    tail = np.mean(es[-80:])
    assert abs(float(e0) + 0.48) < 0.02  # wrong trial starts near -0.48
    np.testing.assert_allclose(tail, -0.5, atol=0.015)


def test_tmove_heatbath_statistics():
    """Empirical T-move frequency matches the analytic heat-bath probability.

    Toy: one electron, one atom, nodeless s-trial psi = e^{-r}. For a
    repulsive channel (v>0) amplitudes need ratio<0 -> NO moves ever; for an
    attractive channel (v<0) p_move = sum(t)/(1+sum(t)) with
    t_q = (e^{-tau v}-1) w_q psi(x_q')/psi(x) all positive and computable in
    closed form from the quadrature.
    """
    import jax
    import jax.numpy as jnp
    from aiqmc_tpu.dmc import tmoves as tm
    from aiqmc_tpu.hamiltonian import ecp
    from aiqmc_tpu.models.network import AINetData

    def signed_network(params, pos, spins, atoms, charges):
        r = jnp.linalg.norm(pos.reshape(1, 3), axis=-1)[0]
        return jnp.ones(()), -r

    pos = jnp.asarray([0.9, 0.0, 0.0])
    data = AINetData(positions=pos, spins=jnp.array([1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([1.0]))
    tau, v0 = 0.05, -3.0
    mk = lambda coe: tm.compute_tmoves(
        list_l=0, tstep=tau, nelectrons=1, natoms=1, ndim=3,
        signed_network=signed_network,
        Rn_non_local=np.array([[[2.0]]]),
        Non_local_coes=np.array([[[coe]]]),
        Non_local_exps=np.array([[[0.0]]]))

    # Repulsive channel: ratio>0 everywhere (nodeless) -> never move.
    tmove_rep = mk(+3.0)
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    _, moved = jax.vmap(lambda k: tmove_rep(data, None, k))(keys)
    assert not np.any(np.asarray(moved))

    # Attractive channel: p_move analytic. The rotated quadrature's weights
    # sum to 1 and |x_q'| = r for every point, so t_q = (e^{-tau v}-1) w_q
    # e^{-(|x_q'| - r)} = (e^{-tau v}-1) w_q exactly, sum(t) = e^{-tau v} - 1.
    tmove_att = mk(v0)
    _, moved = jax.vmap(lambda k: tmove_att(data, None, k))(keys)
    frac = float(np.asarray(moved).mean())
    sum_t = np.exp(-tau * v0) - 1.0
    p_want = sum_t / (1.0 + sum_t)
    sem = np.sqrt(p_want * (1 - p_want) / len(keys))
    assert abs(frac - p_want) < 5 * sem, (frac, p_want)


def test_fused_propagate_matches_split():
    """The one-program DMC step must produce identical weights/positions to
    the 3-program split for the same keys (fused=True is gated on the chip by
    scripts/probe_fused_dmc.py; this pins CPU semantics)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from aiqmc_tpu.dmc.propagate import dmc_propagate
    from aiqmc_tpu.models.network import AINetData

    def stub_net(params, pos, spins, atoms, charges):
        r = pos.reshape(-1, 3)
        return jnp.ones(()), -1.2 * jnp.sum(
            jnp.sqrt(1.0 + jnp.sum(r * r, axis=-1)) - 1.0)

    batch, nelec = 64, 2
    common = dict(
        signed_network=stub_net, log_network=None, logabs_f=None, list_l=2,
        nelectrons=nelec, natoms=1, ndim=3, batch_size=batch, tstep=0.02,
        nsteps=1, charges=jnp.asarray([2.0]), spins=(1, 1), Rn_local=None,
        Local_coes=None, Local_exps=None, Rn_non_local=None,
        Non_local_coes=None, Non_local_exps=None)
    run_split = dmc_propagate(fused=False, **common)
    run_fused = dmc_propagate(fused=True, **common)
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (batch, nelec * 3))
    data = AINetData(positions=pos, spins=jnp.asarray([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.asarray([2.0]))
    w = jnp.ones((batch,))
    e1, w1, d1 = run_split({}, jax.random.PRNGKey(1), data, w, 10.0, -2.9, -2.9)
    e2, w2, d2 = run_fused({}, jax.random.PRNGKey(1), data, w, 10.0, -2.9, -2.9)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(d1.positions),
                               np.asarray(d2.positions), atol=2e-5)


def test_dmc_from_psiformer_trial(tmp_path):
    """DMC restores a PsiFormer VMC checkpoint via driver.main(network=...)
    (arm-D follow-up path, scripts/run_c_ccecp_dmc_psiformer.py)."""
    from aiqmc_tpu.configs import c_atom_ccecp
    from aiqmc_tpu import train
    from aiqmc_tpu.dmc import driver
    from aiqmc_tpu.models import psiformer, spin_indices

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
        cfg.optim.iterations = 1
        cfg.pretrain.iterations = 0
        cfg.mcmc.steps = 1
        cfg.mcmc.burn_in = 1
        cfg.debug.deterministic = True
        cfg.log.save_path = str(tmp_path)
        cfg.log.save_frequency = 1e9
    train.train(cfg)

    spins = np.array([1.0, 1.0, 1.0, -1.0])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, 4)
    up, down = spin_indices.spin_indices_h(spins)
    network = psiformer.make_psiformer(
        nspins=(3, 1), charges=jnp.array([4.0]), parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=1,
        nelectrons=4, determinants=2, num_layers=1, num_heads=2, heads_dim=4,
        mlp_hidden_dims=(8,))
    from aiqmc_tpu.configs import c_atom_ccecp as c
    energies, data, weights = driver.main(
        network=network,
        atoms=np.zeros((1, 3)), charges=np.array([4.0]), spins=spins,
        tstep=0.02, nelectrons=4, nsteps=1, natoms=1, ndim=3, batch_size=16,
        iterations=2, nblocks=2, feedback=1.0, nspins=(3, 1),
        save_path=str(tmp_path), restore_path=None, save_frequency=1e9,
        Rn_local=c.RN_LOCAL, Local_coes=c.LOCAL_COES, Local_exps=c.LOCAL_EXPS,
        Rn_non_local=c.RN_NON_LOCAL, Non_local_coes=c.NON_LOCAL_COES,
        Non_local_exps=c.NON_LOCAL_EXPS, list_l=2, use_tmoves=True,
        quadrature="icosahedral12")
    assert energies.shape == (2,)
    assert np.all(np.isfinite(energies))
    assert np.all(np.isfinite(np.asarray(weights)))


def test_fixed_phase_dmc_projects_boosted_hydrogen():
    """FIXED-PHASE DMC (complex pair trial, beyond the reference): a
    plane-wave-boosted hydrogen trial psi = e^{-0.8 r} e^{i k.r} with the
    wrong magnitude must project to the exact ground state OF the fixed
    phase, E = -0.5 + k^2/2 (H_FP = -del^2/2 + V + |grad phase|^2/2 and
    grad phase = k is constant). Exercises pair_output local energy ->
    Re-E_L branching -> phase_kill=False through dmc_propagate."""
    from aiqmc_tpu.dmc.propagate import dmc_propagate, calculate_total_energy
    from aiqmc_tpu.hamiltonian import local_energy as ae

    alpha = 0.8
    kvec = jnp.array([0.4, 0.0, 0.0])

    def psi(params, pos, spins, atoms, charges):
        return jnp.dot(kvec, pos), -alpha * jnp.linalg.norm(pos)

    batch, tstep = 512, 0.03
    run = (dmc_propagate(
        signed_network=psi, log_network=None, logabs_f=None, list_l=0,
        nelectrons=1, natoms=1, ndim=3, batch_size=batch, tstep=tstep,
        nsteps=1, charges=jnp.array([1.0]), spins=(1, 0), Rn_local=None,
        Local_coes=None, Local_exps=None, Rn_non_local=None,
        Non_local_coes=None, Non_local_exps=None, complex_output=True,
        pair_output=True, phase_kill=False))
    jb = jax.jit(branch_lib.branch)
    key = jax.random.PRNGKey(0)
    data = AINetData(positions=jax.random.normal(key, (batch, 3)),
                     spins=jnp.array([1.0]), atoms=jnp.zeros((1, 3)),
                     charges=jnp.array([1.0]))
    el = ae.local_energy(psi, jnp.array([1.0]), (1, 0), complex_output=True,
                         pair_output=True)
    tot = jax.jit(calculate_total_energy(el, pair_output=True))
    _, (e0, var0) = tot(None, key, data)
    e_trial = e_est = e0
    weights = jnp.ones((batch,))
    es = []
    for t in range(300):
        key, sk, bk = jax.random.split(key, 3)
        energy, weights, data = run(None, sk, data, weights,
                                    10.0 * jnp.sqrt(var0), e_trial, e_est)
        w = weights / jnp.sum(weights)
        e_est = jnp.sum(energy * w)
        es.append(float(e_est))
        if t % 5 == 4:
            data, weights, _ = jb(data, weights, bk)
        e_trial = e_est - 0.3 * jnp.log(jnp.mean(weights)).real
    tail = np.mean(es[-80:])
    want = -0.5 + 0.5 * float(jnp.sum(kvec ** 2))
    # wrong trial starts near the VMC value -0.48 + k^2/2
    assert abs(float(e0) - (-0.48 + 0.08)) < 0.02
    np.testing.assert_allclose(tail, want, atol=0.015)


def test_dmc_periodic_fixed_phase_from_twisted_pair_trial(tmp_path):
    """Periodic fixed-phase DMC end to end: a twisted complex-pairs diamond
    trial (save a checkpoint directly, as a finished VMC run would) drives
    driver.main(lattice=..., pair_output=True) — Ewald + minimum-image ccECP
    Hamiltonian, Re-E_L branching, no T-moves, finite energies/weights."""
    from aiqmc_tpu import checkpoint as ckpt_lib
    from aiqmc_tpu.configs import diamond_ccecp, c_atom_ccecp as c
    from aiqmc_tpu.dmc import driver
    from aiqmc_tpu.models import network as nn_lib, spin_indices
    from aiqmc_tpu.pbc import twist as twist_lib
    from aiqmc_tpu.sampling.init_electrons import init_electrons

    cfg = diamond_ccecp.get_config()
    spins = np.asarray(cfg.system.spins)
    nel = spins.size
    atoms = np.asarray(cfg.system.atoms)
    charges = np.asarray(cfg.system.charges)
    lattice = np.asarray(cfg.system.structure)
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nel)
    up, down = spin_indices.spin_indices_h(spins)
    base = nn_lib.make_ai_net(
        nspins=(4, 4), charges=jnp.asarray(charges), parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=2,
        nelectrons=nel, determinants=2, hidden_dims=((8, 4),),
        hidden_dims_Ynlm=(4,), full_equivariance=True, jastrow_ae=False,
        complex_orbitals=True, complex_pairs=True, lattice=lattice,
        pbc_smooth_r=True)
    tw = (0.25, -0.25, 0.25)
    network = twist_lib.apply_twist(base, lattice, tw)

    key = jax.random.PRNGKey(0)
    params = network.init(key)
    batch = 8
    pos, spins_b = init_electrons(key, None, jnp.asarray(atoms),
                                  jnp.asarray(charges), jnp.asarray(spins),
                                  batch_size=batch, init_width=1.0)
    data = AINetData(positions=pos, spins=spins_b, atoms=jnp.asarray(atoms),
                     charges=jnp.asarray(charges))
    ckpt_lib.save(str(tmp_path), 0, data, params, [])

    pp = cfg.system.pp
    energies, _, weights = driver.main(
        network=network, atoms=atoms, charges=charges, spins=spins,
        tstep=0.02, nelectrons=nel, nsteps=1, natoms=2, ndim=3,
        batch_size=batch, iterations=2, nblocks=2, feedback=1.0,
        nspins=(4, 4), save_path=str(tmp_path), restore_path=None,
        save_frequency=1e9, Rn_local=np.asarray(pp.rn_local),
        Local_coes=np.asarray(pp.local_coes),
        Local_exps=np.asarray(pp.local_exps),
        Rn_non_local=np.asarray(pp.rn_non_local),
        Non_local_coes=np.asarray(pp.non_local_coes),
        Non_local_exps=np.asarray(pp.non_local_exps), list_l=2,
        quadrature="icosahedral12", lattice=lattice, use_tmoves=True,
        complex_output=True, pair_output=True)
    assert energies.shape == (2,)
    assert np.all(np.isfinite(energies))
    assert np.all(np.isfinite(np.asarray(weights)))


def test_tmoves_lattice_translation_invariance():
    """Periodic T-moves: translating every electron by a lattice vector
    leaves the proposed move (relative displacement) and the move decision
    identical — the projector acts about nearest-image atoms and the
    periodic pair network's ratios are translation invariant."""
    from aiqmc_tpu.configs import diamond_ccecp
    from aiqmc_tpu.dmc.tmoves import compute_tmoves
    from aiqmc_tpu.models import network as nn_lib, spin_indices

    cfg = diamond_ccecp.get_config()
    spins = np.asarray(cfg.system.spins)
    nel = spins.size
    lattice = np.asarray(cfg.system.structure)
    atoms = jnp.asarray(cfg.system.atoms)
    charges = jnp.asarray(cfg.system.charges)
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nel)
    up, down = spin_indices.spin_indices_h(spins)
    net = nn_lib.make_ai_net(
        nspins=(4, 4), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=2,
        nelectrons=nel, determinants=2, hidden_dims=((8, 4),),
        hidden_dims_Ynlm=(4,), full_equivariance=True, jastrow_ae=False,
        complex_orbitals=True, complex_pairs=True, lattice=lattice,
        pbc_smooth_r=True)
    params = net.init(jax.random.PRNGKey(0))
    pp = cfg.system.pp
    tmove = compute_tmoves(
        list_l=2, tstep=0.05, nelectrons=nel, natoms=2, ndim=3,
        signed_network=net.apply,
        Rn_non_local=jnp.asarray(pp.rn_non_local),
        Non_local_coes=jnp.asarray(pp.non_local_coes),
        Non_local_exps=jnp.asarray(pp.non_local_exps),
        complex_output=True, quadrature="icosahedral12",
        lattice=jnp.asarray(lattice))

    key = jax.random.PRNGKey(3)
    pos = jax.random.uniform(key, (nel * 3,)) * 3.0
    shift = jnp.tile(jnp.asarray(lattice[0] + lattice[2],
                                 dtype=pos.dtype), nel)
    data = AINetData(positions=pos, spins=jnp.asarray(spins), atoms=atoms,
                     charges=charges)
    data_shift = AINetData(positions=pos + shift, spins=jnp.asarray(spins),
                           atoms=atoms, charges=charges)
    new_pos, moved = tmove(data, params, jax.random.PRNGKey(7))
    new_pos_s, moved_s = tmove(data_shift, params, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(moved), np.asarray(moved_s))
    np.testing.assert_allclose(np.asarray(new_pos_s - new_pos),
                               np.asarray(shift), atol=2e-4)


def test_total_energy_masks_nonfinite_walkers():
    """One walker at |psi|=0 (E_L = -inf/NaN) must not poison E_init/sigma —
    the diamond fixed-phase DMC NaN'd from block 0 through exactly this."""
    from aiqmc_tpu.dmc import propagate

    el_table = jnp.array([-1.0, -1.2, jnp.nan, -0.8])

    def local_energy(params, key, data):
        i = jnp.asarray(data.positions[0], dtype=jnp.int32)
        return el_table[i], None

    total_e = propagate.calculate_total_energy(local_energy)
    data = AINetData(positions=jnp.arange(4.0).reshape(4, 1),
                     spins=jnp.array([1.0]), atoms=jnp.zeros((1, 3)),
                     charges=jnp.ones((1,)))
    e_l, (mean, var) = total_e(None, jax.random.PRNGKey(0), data)
    assert np.isnan(np.asarray(e_l)[2])  # per-walker values stay raw
    np.testing.assert_allclose(float(mean), -1.0, rtol=1e-6)
    assert np.isfinite(float(var))


def test_reweight_kills_nonfinite_walkers():
    from aiqmc_tpu.dmc.propagate import reweight_walkers

    n = 4
    weights = jnp.ones((n,))
    tdamp = jnp.ones((n,))
    v = jnp.zeros((n, 6))
    eloc_old = jnp.array([-1.0, -1.0, jnp.nan, -1.0])
    eloc_new = jnp.array([-1.0, jnp.inf, -1.0, -1.0])
    out = reweight_walkers(weights, tdamp, v, v, eloc_old, eloc_new,
                           branchcut=10.0, e_trial=-1.0, e_est=-1.0,
                           tstep=0.01, nelec=2)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # NaN and +-inf walkers die (|psi| ~ 0 death zone); healthy ones survive
    assert out[1] == 0.0 and out[2] == 0.0
    assert out[0] > 0.0 and out[3] > 0.0


def test_estimate_energy_masks_nonfinite_entries():
    from aiqmc_tpu.dmc import driver

    e = jnp.array([[-1.0, jnp.nan], [-1.0, jnp.inf]])
    w = jnp.array([[1.0, 1.0], [1.0, 1.0]])
    np.testing.assert_allclose(float(driver.estimate_energy(e, w)), -1.0,
                               rtol=1e-6)


def test_robust_init_stats():
    from aiqmc_tpu.dmc.driver import robust_init_stats

    rng = np.random.RandomState(0)
    e = rng.normal(-5.4, 0.3, size=2048)
    e[:4] = [1e4, -1e4, np.inf, np.nan]   # |psi|~0 tail + non-finite walkers
    mean, sigma = robust_init_stats(e)
    assert abs(mean - (-5.4)) < 0.05
    assert abs(sigma - 0.3) < 0.05        # a plain std here would be ~220

    # Degenerate MAD (all energies identical) falls back to plain stats.
    mean, sigma = robust_init_stats(np.full(16, -2.0))
    assert mean == -2.0 and sigma > 0

    with pytest.raises(ValueError, match="non-finite"):
        robust_init_stats(np.array([np.nan, np.inf]))


@pytest.mark.parametrize("periodic", [False, True])
def test_dmc_forward_laplacian_matches_default(periodic):
    """build_dmc_local_energy(laplacian_method="forward") must reproduce the
    batched-tangent E_L — DMC evaluates E_L twice per step, so the forward
    kinetic is a ~2x step lever (wired through driver.main(laplacian=...))."""
    from aiqmc_tpu import config as config_lib
    from aiqmc_tpu import train as train_lib
    from aiqmc_tpu.dmc import propagate
    from aiqmc_tpu.configs import c_atom_ccecp, diamond_ccecp

    if periodic:
        cfg = diamond_ccecp.get_config()
        tw = (0.25, 0.0, 0.25)
        with cfg.unlocked():
            cfg.system.twist = tw
            cfg.network.complex_orbitals = True
            cfg.network.complex_pairs = True
    else:
        cfg = c_atom_ccecp.get_config()
        tw = None
    with cfg.unlocked():
        cfg.network.hidden_dims = ((8, 4), (8, 4))
        cfg.network.hidden_dims_ynlm = (4, 4)
        cfg.network.determinants = 2
    cfg = config_lib.resolve(cfg)
    network = train_lib.network_from_config(cfg)
    params = network.init(jax.random.PRNGKey(0))

    spins = np.asarray(cfg.system.spins)
    nel = spins.size
    natoms = int(np.asarray(cfg.system.atoms).shape[0])
    lattice = (np.asarray(cfg.system.structure) if periodic else None)
    pp = cfg.system.pp
    pair = bool(periodic)
    twist_k = None
    if periodic:
        from aiqmc_tpu.pbc import twist as twist_lib
        twist_k = twist_lib.twist_wavevector(lattice, np.asarray(tw))

    def build(method, orbitals_fn=None, tk=None):
        return propagate.build_dmc_local_energy(
            network.apply, jnp.asarray(np.asarray(cfg.system.charges)),
            tuple(cfg.system.nspins),
            jnp.asarray(np.asarray(pp.rn_local)),
            jnp.asarray(np.asarray(pp.local_coes)),
            jnp.asarray(np.asarray(pp.local_exps)),
            jnp.asarray(np.asarray(pp.rn_non_local)),
            jnp.asarray(np.asarray(pp.non_local_coes)),
            jnp.asarray(np.asarray(pp.non_local_exps)),
            natoms=natoms, nelectrons=nel, ndim=3, list_l=pp.list_l,
            complex_output=pair, pair_output=pair,
            lattice=None if lattice is None else jnp.asarray(lattice),
            quadrature="icosahedral12", laplacian_method=method,
            orbitals_fn=orbitals_fn, twist_k=tk)

    le_default = build("default")
    le_forward = build("forward", orbitals_fn=network.orbitals, tk=twist_k)

    batch = 3
    pos = 0.7 * jax.random.normal(jax.random.PRNGKey(1), (batch, nel * 3))
    data = AINetData(positions=pos,
                     spins=jnp.asarray(spins),
                     atoms=jnp.asarray(np.asarray(cfg.system.atoms)),
                     charges=jnp.asarray(np.asarray(cfg.system.charges)))
    keys = jax.random.split(jax.random.PRNGKey(2), batch)
    in_axes = (None, 0, AINetData(positions=0, spins=None, atoms=None,
                                  charges=None))
    e_d, _ = jax.vmap(le_default, in_axes=in_axes)(params, keys, data)
    e_f, _ = jax.vmap(le_forward, in_axes=in_axes)(params, keys, data)
    # The periodic pair kinetic suffers f32 cancellation (periodic sin/cos
    # features + twist boost): up to ~3e-2 absolute between the two exact
    # formulations at f32, while in f64 they agree to 1e-10 (verified
    # 2026-08-18, kinetic-only probe). The tight bound stays on the
    # molecular case; the periodic case checks the wiring.
    tol = 1e-1 if periodic else 2e-4
    np.testing.assert_allclose(np.asarray(e_f), np.asarray(e_d),
                               rtol=tol, atol=tol)


def test_estimate_energy_all_killed_population_is_finite():
    """An all-killed population (every weight zero/non-finite) must give a
    FINITE block estimate: 0/0 here poisoned E_trial with NaN one line
    before the log-floor guard in the block loop could engage."""
    from aiqmc_tpu.dmc import driver

    e = jnp.array([[jnp.nan, jnp.inf], [-1.0, -1.0]])
    w = jnp.array([[1.0, 1.0], [0.0, 0.0]])
    assert np.isfinite(float(driver.estimate_energy(e, w)))


def test_dmc_ema_restart_from_own_checkpoint(tmp_path):
    """A killed EMA DMC run must be restartable: DMC's own checkpoints carry
    no extras, so the EMA extraction has to be skipped on restart (the
    restored params ARE the substituted trial) instead of raising — the
    wedge-tolerant chip queues rely on this."""
    from aiqmc_tpu import config as config_lib
    from aiqmc_tpu import checkpoint as checkpoint_lib
    from aiqmc_tpu import train
    from aiqmc_tpu.dmc import driver

    vmc_dir = tmp_path / "vmc"
    dmc_dir = tmp_path / "dmc"
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.array([[0.0, 0.0, 0.0]])
        cfg.system.charges = np.array([2.0])
        cfg.system.spins = np.array([1.0, -1.0])
        cfg.batch_size = 8
        cfg.optim.iterations = 2
        cfg.optim.optimizer = "adam"
        cfg.optim.ema_decay = 0.9
        cfg.mcmc.steps = 2
        cfg.mcmc.burn_in = 2
        cfg.network.hidden_dims = ((8, 4),)
        cfg.network.hidden_dims_ynlm = (4,)
        cfg.debug.deterministic = True
        cfg.log.save_path = str(vmc_dir)
        cfg.log.save_frequency = 0.0
    train.train(cfg)
    assert checkpoint_lib.has_ema(str(vmc_dir))
    assert not checkpoint_lib.has_ema(str(dmc_dir))

    kwargs = dict(
        atoms=np.array([[0.0, 0.0, 0.0]]), charges=np.array([2.0]),
        spins=np.array([1.0, -1.0]), tstep=0.02, nelectrons=2,
        nsteps=1, natoms=1, ndim=3, batch_size=8, iterations=1, nblocks=1,
        feedback=1.0, nspins=(1, 1), save_path=str(dmc_dir),
        restore_path=str(vmc_dir), save_frequency=1e9, use_ema=True,
        network_kwargs={"hidden_dims": ((8, 4),),
                        "hidden_dims_Ynlm": (4,),
                        "full_equivariance": True,
                        "complex_orbitals": False})
    e1, data, _ = driver.main(**kwargs)
    assert np.all(np.isfinite(np.asarray(e1)))

    # Simulate the mid-run checkpoint of a killed DMC leg: params saved
    # WITHOUT extras into DMC's own save dir. The restart (same argv) used
    # to die with "VMC checkpoint carries no EMA params".
    vmc_ckpt = checkpoint_lib.find_last_checkpoint(str(vmc_dir))
    _, data_v, params_v, _, _ = checkpoint_lib.restore(vmc_ckpt)
    checkpoint_lib.save(str(dmc_dir), 7, data_v, params_v, {})
    e2, _, _ = driver.main(**kwargs)
    assert np.all(np.isfinite(np.asarray(e2)))
