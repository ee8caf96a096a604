"""Density / one-RDM estimator tests."""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import density
from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.parallel import multi_host


def _gauss_net(params, pos, spins, atoms, charges):
    del params, spins, atoms, charges
    return jnp.ones(()), -0.5 * jnp.sum(pos ** 2)


def test_one_rdm_identity_point():
    """Replacing electron 0 by its own position must give ratio exactly 1."""
    rdm = density.make_one_rdm(_gauss_net, nelectrons=2)
    pos = jnp.asarray(np.random.RandomState(0).normal(size=(4, 6)))
    data = AINetData(positions=pos, spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    rprime = pos[0, :3][None]  # electron 0 of walker 0
    out = rdm(None, data, rprime)
    np.testing.assert_allclose(float(out[0, 0]), 1.0, rtol=1e-5)


def test_one_rdm_gaussian_ratio():
    """For psi = exp(-|x|^2/2), ratio = exp((|r1|^2 - |r'|^2)/2) exactly."""
    rdm = density.make_one_rdm(_gauss_net, nelectrons=2)
    pos = jnp.asarray([[1.0, 0, 0, 0, 1.0, 0]])
    data = AINetData(positions=pos, spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    rprime = jnp.asarray([[2.0, 0.0, 0.0]])
    out = rdm(None, data, rprime)
    want = np.exp((1.0 - 4.0) / 2.0)
    np.testing.assert_allclose(float(out[0, 0]), want, rtol=1e-5)


def test_radial_density_normalisation():
    rng = np.random.RandomState(1)
    pos = jnp.asarray(rng.normal(size=(512, 6)))
    data = AINetData(positions=pos, spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    mids, n_r = density.radial_density_profile(data, bins=40, limit=6.0)
    integral = float(jnp.sum(
        n_r * 4.0 * np.pi * mids ** 2 * (mids[1] - mids[0])))
    np.testing.assert_allclose(integral, 2.0, rtol=0.05)  # 2 electrons


def test_multi_host_single_process():
    assert multi_host.broadcast_seed(42) == 42
    assert multi_host.check_synced({"w": jnp.ones((3,))})


def test_one_rdm_aux_mcmc_hf_oracle():
    """For the HF determinant itself, rho^s in the MO basis = diag(occ).

    He (1 up, 1 down): psi = phi_0(r1) phi_0(r2) -> rho^s_ij = delta_i0
    delta_j0 per spin channel, trace 1.
    """
    import jax
    import jax.numpy as jnp
    from aiqmc_tpu import density as density_lib
    from aiqmc_tpu.models.network import AINetData
    from aiqmc_tpu.utils import scf as scf_lib
    from aiqmc_tpu.utils.gto import eval_basis

    atoms = np.zeros((1, 3))
    charges = np.array([2.0])
    rhf = scf_lib.run_rhf(atoms, charges, nelectrons=2)
    mo = jnp.asarray(rhf.mo_coeff)
    basis = rhf.basis

    def signed_network(params, pos, spins, atoms_, charges_):
        del params, spins, atoms_, charges_
        x = pos.reshape(2, 3)
        phi = eval_basis(basis, x) @ mo[:, :1]     # (2, 1)
        val = phi[0, 0] * phi[1, 0]
        return jnp.sign(val), jnp.log(jnp.abs(val))

    init, update, estimator = density_lib.make_one_rdm_aux(
        signed_network, atoms, charges, nspins=(1, 1))

    # Sample walkers from |psi|^2 = phi0(r1)^2 phi0(r2)^2 by RW MH.
    batch = 2048
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (batch, 6))

    def logprob(x):
        phi = eval_basis(basis, x.reshape(2, 3)) @ mo[:, :1]
        return 2 * (jnp.log(jnp.abs(phi[0, 0])) + jnp.log(jnp.abs(phi[1, 0])))

    @jax.jit
    def mh(pos, key):
        def body(i, carry):
            pos, lp, key = carry
            key, k1, k2 = jax.random.split(key, 3)
            prop = pos + 0.4 * jax.random.normal(k1, pos.shape)
            lp_new = jax.vmap(logprob)(prop)
            acc = jnp.log(jax.random.uniform(k2, lp.shape)) < lp_new - lp
            return jnp.where(acc[:, None], prop, pos), jnp.where(acc, lp_new, lp), key
        lp = jax.vmap(logprob)(pos)
        pos, _, _ = jax.lax.fori_loop(0, 200, body, (pos, lp, key))
        return pos

    pos = mh(pos, jax.random.fold_in(key, 1))
    data = AINetData(positions=pos, spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.asarray(atoms), charges=jnp.asarray(charges))

    state = init(jax.random.fold_in(key, 2), data)
    for i in range(30):
        state = update(None, state, jax.random.fold_in(key, 3 + i))
    rho = np.asarray(estimator(None, data, state))

    assert rho.shape[0] == 2
    for s in range(2):
        np.testing.assert_allclose(rho[s, 0, 0], 1.0, atol=0.1)
        assert abs(np.trace(rho[s]) - 1.0) < 0.15
        offdiag = rho[s] - np.diag(np.diag(rho[s]))
        assert np.max(np.abs(offdiag)) < 0.1


def test_one_rdm_states_aux_hf_oracle():
    """Excited one-RDM state matrices on exact mean-field states.

    Two states of a 2-electron system (even-tempered He basis): state 0 =
    ground determinant phi_0(up) phi_0(dn), state 1 = the dn 0->1 excitation
    phi_0(up) phi_1(dn). Oracles (orthonormal MOs):
      * diagonal [k, k] blocks = diag(occupations of state k) per channel;
      * the dn-channel TRANSITION block [0, 1] has its unit element at the
        single allowed (a, b) = (1, 0) / (0, 1) pair and nothing else;
      * the up-channel transition block vanishes (orthogonal dn factors).
    """
    import jax
    import jax.numpy as jnp
    from aiqmc_tpu import density as density_lib
    from aiqmc_tpu.models.network import AINetData
    from aiqmc_tpu.utils import scf as scf_lib
    from aiqmc_tpu.utils.gto import eval_basis

    atoms = np.zeros((1, 3))
    charges = np.array([2.0])
    rhf = scf_lib.run_rhf(atoms, charges, nelectrons=2,
                          basis="even_tempered")
    mo = jnp.asarray(rhf.mo_coeff)
    basis = rhf.basis
    states = 2
    occs = [((0,), (0,)), ((0,), (1,))]   # (up, dn) MO columns per state

    def state_signs_logs(params, pos, spins, atoms_, charges_):
        del params, spins, atoms_, charges_
        x = pos.reshape(2, 3)
        phi = eval_basis(basis, x) @ mo   # (2, norb)
        vals = jnp.stack([phi[0, u[0]] * phi[1, d[0]] for u, d in occs])
        return jnp.sign(vals), jnp.log(jnp.abs(vals) + 1e-300)

    # Sample the EXTENDED configuration from |det M|^2 by RW MH.
    def ext_logprob(xx):
        cfg = xx.reshape(states, 6)
        rows = [state_signs_logs(None, cfg[j], None, None, None)
                for j in range(states)]
        m = jnp.stack([s * jnp.exp(l) for s, l in rows])  # [j, i]
        _, logdet = jnp.linalg.slogdet(m)
        return 2.0 * logdet

    batch = 2048
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (batch, states * 6))

    @jax.jit
    def mh(pos, key):
        def body(i, carry):
            pos, lp, key = carry
            key, k1, k2 = jax.random.split(key, 3)
            prop = pos + 0.35 * jax.random.normal(k1, pos.shape)
            lp_new = jax.vmap(ext_logprob)(prop)
            acc = jnp.log(jax.random.uniform(k2, lp.shape)) < lp_new - lp
            return (jnp.where(acc[:, None], prop, pos),
                    jnp.where(acc, lp_new, lp), key)
        lp = jax.vmap(ext_logprob)(pos)
        pos, _, _ = jax.lax.fori_loop(0, 250, body, (pos, lp, key))
        return pos

    pos = mh(pos, jax.random.fold_in(key, 1))
    data = AINetData(positions=pos, spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.asarray(atoms), charges=jnp.asarray(charges))

    init, update, estimator = density_lib.make_one_rdm_states_aux(
        state_signs_logs, atoms, charges, nspins=(1, 1), states=states,
        basis="even_tempered")
    state = init(jax.random.fold_in(key, 2), data)
    for i in range(30):
        state = update(None, state, jax.random.fold_in(key, 3 + i))
    rho = np.asarray(jax.jit(estimator)(None, data, state))

    assert rho.shape == (2, mo.shape[0], mo.shape[0], states, states)
    # Diagonal state blocks: occupations.
    np.testing.assert_allclose(rho[0, 0, 0, 0, 0], 1.0, atol=0.15)  # up, gs
    np.testing.assert_allclose(rho[1, 0, 0, 0, 0], 1.0, atol=0.15)  # dn, gs
    np.testing.assert_allclose(rho[0, 0, 0, 1, 1], 1.0, atol=0.15)  # up, ex
    np.testing.assert_allclose(rho[1, 1, 1, 1, 1], 1.0, atol=0.15)  # dn, ex
    assert abs(rho[1, 0, 0, 1, 1]) < 0.15   # dn orbital 0 empty in state 1
    # dn transition block: single allowed element.
    trans = rho[1, :, :, 0, 1]
    amax = np.unravel_index(np.argmax(np.abs(trans)), trans.shape)
    assert amax in {(0, 1), (1, 0)}, (amax, trans)
    assert np.abs(trans[amax]) > 0.6
    # up transition block vanishes (orthogonal dn factors).
    assert np.max(np.abs(rho[0, :, :, 0, 1])) < 0.15


def test_train_driver_states_density(tmp_path):
    """cfg.observables.density on an excited-state run wires the state-matrix
    one-RDM (shape (channels, norb, norb, K, K) in density_rdm.npy) instead of
    silently misreading the extended walkers with the ground estimator."""
    import jax
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
        cfg.observables.density = True
        cfg.observables.density_mcmc_steps = 2
        cfg.debug.deterministic = True
        cfg.log.save_frequency = 1e9
        cfg.log.stats_frequency = 1
        cfg.log.save_path = str(tmp_path)
    train.train(cfg)
    rho = np.load(tmp_path / "density_rdm.npy")
    assert rho.ndim == 5 and rho.shape[3:] == (2, 2)
    assert np.all(np.isfinite(rho))
