"""Periodic pseudopotential local energy (hamiltonian/pp_pbc.py) and twisted
boundary conditions (pbc/twist.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.configs import c_atom_ccecp
from aiqmc_tpu.hamiltonian import pp_local_energy, pp_pbc
from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.pbc import twist as twist_lib

CC = c_atom_ccecp


def _stub_network(decay=1.5):
    """Smooth nodeless real trial: log|psi| = -decay * sum_i |r_i| (about the
    origin atom), phase = sign +1."""

    def apply(params, pos, spins, atoms, charges):
        r = jnp.reshape(pos, (-1, 3))
        return jnp.ones(()), -decay * jnp.sum(
            jnp.sqrt(1.0 + jnp.sum(r * r, axis=-1)) - 1.0)

    return apply


def _pp_kwargs():
    return dict(
        rn_local=jnp.asarray(CC.RN_LOCAL),
        local_coes=jnp.asarray(CC.LOCAL_COES),
        local_exps=jnp.asarray(CC.LOCAL_EXPS),
        rn_non_local=jnp.asarray(CC.RN_NON_LOCAL),
        non_local_coes=jnp.asarray(CC.NON_LOCAL_COES),
        non_local_exps=jnp.asarray(CC.NON_LOCAL_EXPS),
        natoms=1, nelectrons=4, ndim=3, list_l=2)


def _data(pos):
    return AINetData(positions=pos, spins=jnp.asarray([1., 1., 1., -1.]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.asarray([4.0]))


def test_large_cell_limit_matches_molecular_pp():
    """In a huge cell a neutral valence system's periodic E_L converges to the
    molecular ccECP E_L (Ewald -> isolated Coulomb for a tight neutral
    cluster; minimum-image corrections are identity)."""
    f = _stub_network()
    kwargs = _pp_kwargs()
    e_mol = pp_local_energy.local_energy(
        f=f, lognetwork=None, charges=jnp.asarray([4.0]), nspins=(3, 1),
        quadrature="icosahedral12", **kwargs)
    lattice = 60.0 * jnp.eye(3)
    e_pbc = pp_pbc.local_energy(
        f=f, charges=jnp.asarray([4.0]), nspins=(3, 1), lattice=lattice,
        convergence_radius=5, quadrature="icosahedral12", **kwargs)
    pos = 0.8 * jax.random.normal(jax.random.PRNGKey(0), (12,))
    key = jax.random.PRNGKey(1)
    v_mol, _ = e_mol({}, key, _data(pos))
    v_pbc, _ = e_pbc({}, key, _data(pos))
    np.testing.assert_allclose(float(v_pbc), float(v_mol), atol=5e-3)


def test_pp_pbc_lattice_translation_invariance():
    """Shifting any electron by a lattice vector leaves E_L invariant (the
    stub trial is not periodic, so only potential terms are compared via a
    periodic constant trial)."""

    def const_net(params, pos, spins, atoms, charges):
        return jnp.ones(()), jnp.zeros(())

    a = 6.74
    lattice = jnp.asarray([[0., a / 2, a / 2], [a / 2, 0., a / 2],
                           [a / 2, a / 2, 0.]])
    e_pbc = pp_pbc.local_energy(
        f=const_net, charges=jnp.asarray([4.0]), nspins=(3, 1),
        lattice=lattice, convergence_radius=5, quadrature="icosahedral12",
        **_pp_kwargs())
    pos = 0.9 * jax.random.normal(jax.random.PRNGKey(2), (12,))
    shift = jnp.tile(lattice[0], 4)  # every electron by one lattice vector
    key = jax.random.PRNGKey(3)
    v0, _ = e_pbc({}, key, _data(pos))
    v1, _ = e_pbc({}, key, _data(pos + shift))
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)


def test_twist_boost_kinetic_free_particle():
    """For a constant trial, the twist boost's kinetic energy is exactly
    nelec * |k|^2 / 2 through the pair complex kinetic path."""
    from aiqmc_tpu.hamiltonian.kinetic import local_kinetic_energy
    import dataclasses
    from aiqmc_tpu.models.network import Network

    lattice = 5.0 * jnp.eye(3)
    theta = np.array([0.25, -0.5, 0.125])

    def const_apply(params, pos, spins, atoms, charges):
        return jnp.zeros(()), jnp.zeros(())

    net = Network(init=lambda k: {}, apply=const_apply, orbitals=None)
    twisted = twist_lib.apply_twist(net, lattice, theta)
    ke = local_kinetic_energy(twisted.apply, complex_output=True,
                              pair_output=True)
    nelec = 3
    pos = jax.random.normal(jax.random.PRNGKey(0), (3 * nelec,))
    out = ke({}, _data_n(pos, nelec))
    k = np.asarray(twist_lib.twist_wavevector(lattice, theta))
    want = nelec * float(k @ k) / 2.0
    np.testing.assert_allclose(float(out[0]), want, rtol=1e-5)
    np.testing.assert_allclose(float(out[1]), 0.0, atol=1e-5)


def _data_n(pos, nelec):
    spins = jnp.asarray([1.0] * ((nelec + 1) // 2) + [-1.0] * (nelec // 2))
    return AINetData(positions=pos, spins=spins, atoms=jnp.zeros((1, 3)),
                     charges=jnp.asarray([float(nelec)]))


def test_twist_boundary_condition_phase():
    """psi_theta(r + L) picks up exactly k.L of phase per shifted electron."""
    from aiqmc_tpu.models.network import Network

    lattice = jnp.asarray([[4., 0., 0.], [0., 5., 0.], [0., 0., 6.]])
    theta = np.array([0.5, 0.0, -0.25])

    def base_apply(params, pos, spins, atoms, charges):
        return jnp.zeros(()), jnp.sum(pos) * 0.01

    net = Network(init=lambda k: {}, apply=base_apply, orbitals=None)
    tw = twist_lib.apply_twist(net, lattice, theta)
    pos = jax.random.normal(jax.random.PRNGKey(1), (6,))
    shift = jnp.concatenate([lattice[0], jnp.zeros(3)])  # electron 0 by L_0
    p0, m0 = tw.apply({}, pos, None, None, None)
    p1, m1 = tw.apply({}, pos + shift, None, None, None)
    k = twist_lib.twist_wavevector(lattice, theta)
    np.testing.assert_allclose(float(p1 - p0), float(k @ lattice[0]),
                               rtol=1e-5)


def test_monkhorst_pack_twists():
    g = twist_lib.monkhorst_pack_twists(2)
    assert g.shape == (8, 3)
    assert np.all(g >= -0.5) and np.all(g < 0.5)
    # Symmetric grid: twists come in +-theta pairs.
    np.testing.assert_allclose(np.sort(g[:, 0]), np.sort(-g[:, 0]))


def test_train_builds_pp_pbc_and_twist():
    """_build_local_energy dispatches to pp_pbc under pbc+use_pp, and a twisted
    complex-pairs network builds and evaluates finitely."""
    from aiqmc_tpu import train as train_lib
    from aiqmc_tpu import config as config_lib
    from aiqmc_tpu.configs import diamond_ccecp

    cfg = diamond_ccecp.get_config()
    with cfg.unlocked():
        cfg.network.hidden_dims = ((8, 4),) * 2
        cfg.network.hidden_dims_ynlm = (4, 4)
        cfg.network.complex_orbitals = True
        cfg.network.complex_pairs = True
        cfg.system.twist = (0.5, 0.0, 0.0)
    cfg = config_lib.resolve(cfg)
    network, _ = train_lib._build_network(cfg)
    e_l = train_lib._build_local_energy(cfg, network)
    params = network.init(jax.random.PRNGKey(0))
    nelec = int(np.asarray(cfg.system.spins).size)
    pos = jax.random.normal(jax.random.PRNGKey(1), (3 * nelec,))
    data = AINetData(positions=pos, spins=jnp.asarray(cfg.system.spins),
                     atoms=jnp.asarray(cfg.system.atoms),
                     charges=jnp.asarray(cfg.system.charges))
    val, _ = e_l(params, jax.random.PRNGKey(2), data)
    assert val.shape == (2,)  # pair [Re, Im]
    assert np.all(np.isfinite(np.asarray(val)))


def test_tabc_real_checkpoint_pointwise_identity():
    """TABC on a Gamma-trained REAL network (real_to_angle + boost): pointwise
    Re E_L(twist) = E_L(Gamma) + nelec |k|^2 / 2 (the boost's phase gradient
    is k per electron; the sign's phase gradient is 0 a.e.), and the sampler's
    log|psi| is untouched. Uses the ALL-ELECTRON periodic config: for a
    nonlocal ECP the identity intentionally fails — the displaced-electron
    psi-ratios pick up genuine cos(k.(r'-r)) twist factors."""
    from aiqmc_tpu import config as config_lib
    from aiqmc_tpu import train as train_lib
    from aiqmc_tpu.configs import diamond

    base = diamond.get_config()
    with base.unlocked():
        base.network.hidden_dims = ((8, 4),) * 2
        base.network.hidden_dims_ynlm = (4, 4)
        base.optim.laplacian = "default"
    cfg_g = config_lib.resolve(base)
    net_g, _ = train_lib._build_network(cfg_g)
    e_g = train_lib._build_local_energy(cfg_g, net_g)

    theta = (0.5, 0.0, 0.25)
    cfg_t = config_lib.resolve(base)
    with cfg_t.unlocked():
        cfg_t.system.twist = theta
    net_t, _ = train_lib._build_network(cfg_t)
    e_t = train_lib._build_local_energy(cfg_t, net_t)

    params = net_g.init(jax.random.PRNGKey(0))
    nelec = 12
    pos = jax.random.normal(jax.random.PRNGKey(1), (3 * nelec,))
    spins = jnp.asarray(cfg_g.system.spins)
    atoms = jnp.asarray(cfg_g.system.atoms)
    charges = jnp.asarray(cfg_g.system.charges)
    data = AINetData(positions=pos, spins=spins, atoms=atoms, charges=charges)

    key = jax.random.PRNGKey(2)
    v_g, _ = e_g(params, key, data)        # real scalar
    v_t, _ = e_t(params, key, data)        # pair [Re, Im]
    k = np.asarray(twist_lib.twist_wavevector(np.asarray(lattice_of(cfg_g)),
                                              np.asarray(theta)))
    want = float(v_g) + nelec * float(k @ k) / 2.0
    np.testing.assert_allclose(float(v_t[0]), want, rtol=2e-4)
    # magnitudes (sampling density) identical
    _, m_g = net_g.apply(params, pos, spins, atoms, charges)
    _, m_t = net_t.apply(params, pos, spins, atoms, charges)
    np.testing.assert_allclose(float(m_g), float(m_t), rtol=1e-6)


def lattice_of(cfg):
    return cfg.system.structure
