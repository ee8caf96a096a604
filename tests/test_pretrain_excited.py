"""Pretraining and excited-state ansatz tests."""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import pretrain
from aiqmc_tpu.models import excited, network as nn, spin_indices
from aiqmc_tpu.models.network import AINetData


def _net(nelec=4, natoms=1):
    spins = np.array([1.0] * (nelec // 2) + [-1.0] * (nelec - nelec // 2))
    atoms = jnp.zeros((natoms, 3))
    charges = jnp.asarray([float(nelec)] * natoms)
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nelec)
    up, down = spin_indices.spin_indices_h(spins)
    net = nn.make_ai_net(
        nspins=(len(up), len(down)), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=natoms,
        nelectrons=nelec, full_equivariance=True, complex_orbitals=False,
        hidden_dims=((8, 4), (8, 4)), hidden_dims_Ynlm=(4, 4))
    return net, jnp.asarray(spins), atoms, charges


def test_hydrogenic_targets_shapes():
    targets = pretrain.make_hydrogenic_orbitals(
        np.zeros((1, 3)), np.array([4.0]), (2, 2))
    pos = jnp.asarray(np.random.RandomState(0).normal(size=(12,)))
    up, down = targets(pos)
    assert up.shape == (2, 2)
    assert down.shape == (2, 2)
    assert np.isfinite(np.asarray(up)).all()


def test_pretrain_reduces_orbital_loss():
    net, spins, atoms, charges = _net()
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (32, 12))
    data = AINetData(positions=pos, spins=spins, atoms=atoms, charges=charges)
    params0, _ = pretrain.pretrain_orbitals(
        net, data, (2, 2), iterations=1, key=key)
    params1, _ = pretrain.pretrain_orbitals(
        net, data, (2, 2), iterations=40, key=key)

    targets = pretrain.make_hydrogenic_orbitals(
        np.zeros((1, 3)), np.array([4.0]), (2, 2))

    def orbital_loss(params):
        def single(p):
            dets = net.orbitals(params, p, spins, atoms, charges)[0]
            up, down = targets(p)
            target = jnp.zeros((4, 4))
            target = target.at[:2, :2].set(up).at[2:, 2:].set(down)
            return jnp.mean((dets.real - target[None]) ** 2)

        return float(jnp.mean(jax.vmap(single)(pos)))

    assert orbital_loss(params1) < orbital_loss(params0)


def test_total_ansatz_antisymmetric_in_states():
    """The total ansatz det[psi_i(x_j)] flips sign when two configurations are
    exchanged."""
    net, spins, atoms, charges = _net()
    states = 2
    init, apply = excited.make_total_ansatz(net, states)
    params = init(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (states, 12))
    sign1, log1 = apply(params, x.reshape(-1), spins, atoms, charges)
    x_swapped = x[jnp.array([1, 0])]
    sign2, log2 = apply(params, x_swapped.reshape(-1), spins, atoms, charges)
    np.testing.assert_allclose(float(log1), float(log2), rtol=1e-5)
    np.testing.assert_allclose(float(sign2), -float(sign1), atol=1e-6)


def test_state_matrix_shape():
    net, spins, atoms, charges = _net()
    init, apply = excited.make_state_matrix(net, 3)
    params = init(jax.random.PRNGKey(3))
    x = jax.random.normal(jax.random.PRNGKey(4), (3 * 12,))
    sign, log = apply(params, x, spins, atoms, charges)
    assert sign.shape == (3, 3)
    assert log.shape == (3, 3)


def test_pretrain_through_driver(tmp_path):
    """cfg.pretrain.iterations > 0 runs RHF-target pretraining before VMC
    (ref ferminet/train.py:427-438 wiring)."""
    from aiqmc_tpu import config as config_lib, train

    cfg = config_lib.default()
    cfg.system.atoms = np.array([[0.0, 0.0, 0.0]])
    cfg.system.charges = np.array([4.0])
    cfg.system.spins = np.array([1.0, 1.0, -1.0, -1.0])
    cfg.batch_size = 16
    cfg.optim.iterations = 2
    cfg.pretrain.iterations = 3
    cfg.mcmc.steps = 1
    cfg.mcmc.burn_in = 1
    cfg.network.hidden_dims = ((8, 4), (8, 4))
    cfg.network.hidden_dims_ynlm = (4, 4)
    cfg.debug.deterministic = True
    cfg.log.save_path = str(tmp_path)
    cfg.log.save_frequency = 1e9
    r = train.train(cfg)
    assert np.all(np.isfinite(r.energies))


def test_pretrain_valence_ecp_targets():
    """ECP pretraining targets: pseudo-RHF orbitals drive the pretrain step."""
    import jax
    import jax.numpy as jnp
    from aiqmc_tpu import pretrain as pretrain_lib
    from aiqmc_tpu.configs import c_atom_ccecp
    from aiqmc_tpu.models import network as nn, spin_indices
    from aiqmc_tpu.models.network import AINetData

    cfg = c_atom_ccecp.get_config()
    spins = np.array(cfg.system.spins)
    nel = spins.size
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nel)
    up, down = spin_indices.spin_indices_h(spins)
    net = nn.make_ai_net(
        nspins=(2, 2), charges=jnp.asarray(cfg.system.charges),
        parallel_indices=par, antiparallel_indices=anti,
        spin_up_indices=up, spin_down_indices=down, n_parallel=n_par,
        n_antiparallel=n_anti, ndim=3, natoms=1, nelectrons=nel,
        full_equivariance=True, complex_orbitals=False, bounded_envelope=True,
        regular_harmonics=True, hidden_dims=((8, 4), (8, 4)),
        hidden_dims_Ynlm=(4, 4))
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (32, nel * 3))
    data = AINetData(positions=pos, spins=jnp.asarray(spins),
                     atoms=jnp.asarray(cfg.system.atoms),
                     charges=jnp.asarray(cfg.system.charges))
    params, data = pretrain_lib.pretrain_orbitals(
        net, data, (2, 2), iterations=3, key=key, pp_cfg=cfg.system.pp)
    flat = jax.tree_util.tree_leaves(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)

    # And the target factory itself produces the valence-RHF orbitals.
    targets = pretrain_lib.make_ecp_rhf_targets(
        np.asarray(cfg.system.atoms), np.asarray(cfg.system.charges),
        cfg.system.pp, (2, 2))
    phi_u, phi_d = targets(pos[0])
    assert phi_u.shape == (2, 2) and phi_d.shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(phi_u)))


def _shared_net(nelec, nspins, spins, charges, determinants):
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nelec)
    up, down = spin_indices.spin_indices_h(spins)
    return nn.make_ai_net(
        nspins=nspins, charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=1,
        nelectrons=nelec, full_equivariance=True, complex_orbitals=False,
        bounded_envelope=True, regular_harmonics=True,
        determinants=determinants, hidden_dims=((8, 4), (8, 4)),
        hidden_dims_Ynlm=(4, 4))


def test_lowest_excitations_ordering_and_pauli():
    """Hand-checkable spectrum eps=[0,1,2,3], nocc=(2,1): the two dE=1
    singles come first (up 1->2 and dn 0->1), every result preserves S_z
    (occupied counts unchanged) and respects Pauli (distinct indices)."""
    from aiqmc_tpu.utils import scf

    eps = (np.array([0.0, 1, 2, 3]), np.array([0.0, 1, 2, 3]))
    exc = scf.lowest_excitations(eps, (2, 1), 6)
    des = [de for de, _, _ in exc]
    assert des == sorted(des)
    np.testing.assert_allclose(des[:2], [1.0, 1.0])
    for de, occ_up, occ_dn in exc:
        assert len(occ_up) == 2 and len(occ_dn) == 1  # S_z preserved
        assert len(set(occ_up.tolist())) == 2         # Pauli
    # The two dE=1 determinants are exactly {up 1->2} and {dn 0->1}.
    got = {(tuple(u), tuple(d)) for _, u, d in exc[:2]}
    assert got == {((0, 2), (0,)), ((0, 1), (1,))}


def test_excited_target_list_state0_is_ground():
    """State 0 of the excited target list must equal the plain UHF ground
    targets (same MO columns, same basis evaluation)."""
    from aiqmc_tpu.utils import scf

    atoms = np.zeros((1, 3))
    charges = np.array([3.0])
    nspins = (2, 1)
    result = scf.run_uhf(atoms, charges, nspins=nspins)
    fns = scf.make_excited_target_list(result, nspins, states=3)
    ground = scf.make_uhf_orbitals(result, nspins)
    pos = jnp.asarray(np.random.RandomState(0).normal(size=(9,)))
    want_u, want_d = ground(pos)
    got_u, got_d = fns[0](pos)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u))
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d))
    # Excited states use different columns -> different targets.
    exc_u, exc_d = fns[1](pos)
    assert (np.abs(np.asarray(exc_u) - np.asarray(want_u)).max() > 1e-8
            or np.abs(np.asarray(exc_d) - np.asarray(want_d)).max() > 1e-8)


def test_pretrain_states_reduces_loss():
    """Shared-network excited pretraining must drive each determinant group
    toward its own mean-field determinant: the orbital MSE after 120 Adam
    steps is well below the initial value (the first ~40 steps can RISE while
    the interleaved MCMC moves walkers from the init cloud into the ansatz's
    high-|psi| region — the loss landscape itself is changing)."""
    spins = np.array([1.0, 1.0, -1.0])
    nel, states, ndets = 3, 2, 2
    nspins = (2, 1)
    charges = jnp.asarray([3.0])
    net = _shared_net(nel, nspins, spins, charges, states * ndets)
    batch = 32
    key = jax.random.PRNGKey(0)
    pos = 0.7 * jax.random.normal(key, (batch, states * nel * 3))
    data = AINetData(positions=pos, spins=jnp.asarray(spins),
                     atoms=jnp.zeros((1, 3)), charges=charges)

    from aiqmc_tpu.utils import scf
    result = scf.run_uhf(np.zeros((1, 3)), np.array([3.0]), nspins=nspins)
    target_fns = scf.make_excited_target_list(result, nspins, states)
    tot_apply = excited.make_shared_total_ansatz(net, states)[1]
    batch_logabs = jax.vmap(
        lambda p, x, s, a, c: tot_apply(p, x, s, a, c)[1],
        in_axes=(None, 0, None, None, None))
    import optax
    opt = optax.adam(3e-3)
    params = net.init(jax.random.PRNGKey(1))
    step = jax.jit(pretrain.make_pretrain_states_step(
        net.orbitals, batch_logabs, target_fns, opt, nspins, states))
    opt_state = opt.init(params)
    losses = []
    for i in range(120):
        key, sub = jax.random.split(key)
        params, opt_state, data, loss, _ = step(params, opt_state, data, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


def test_pretrain_orbitals_states_entrypoint():
    """pretrain_orbitals(states=K) end-to-end on extended walkers. Li, not
    He: STO-3G He has a single basis function, so no virtuals exist and the
    excitation enumeration correctly refuses (its ValueError is upstream
    behaviour too — 'Try a larger basis set')."""
    spins = np.array([1.0, 1.0, -1.0])
    nel, states, ndets = 3, 2, 2
    nspins = (2, 1)
    charges = jnp.asarray([3.0])
    net = _shared_net(nel, nspins, spins, charges, states * ndets)
    pos = 0.7 * jax.random.normal(jax.random.PRNGKey(0),
                                  (16, states * nel * 3))
    data = AINetData(positions=pos, spins=jnp.asarray(spins),
                     atoms=jnp.zeros((1, 3)), charges=charges)
    params, data2 = pretrain.pretrain_orbitals(
        net, data, nspins, iterations=3, states=states)
    leaves = jax.tree_util.tree_leaves(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert data2.positions.shape == pos.shape
