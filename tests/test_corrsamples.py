"""SWCT correlated-samples tests."""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import corrsamples


def test_zero_displacement_is_identity():
    atoms = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    pos = jnp.array([0.3, 0.2, -0.1, 0.9, 0.1, 0.4])
    new_pos = corrsamples.correlated_samples(atoms, atoms, pos)
    np.testing.assert_allclose(np.asarray(new_pos), np.asarray(pos), atol=1e-7)
    jac = corrsamples.weights_jacobian(pos, atoms, atoms)
    np.testing.assert_allclose(float(jac), 1.0, rtol=1e-5)


def test_rigid_translation_moves_all_electrons():
    """If all atoms shift by d, omega weights sum to 1 per electron, so every
    electron shifts by exactly d (SWCT exactness for rigid translations)."""
    atoms = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    d = jnp.array([0.1, -0.2, 0.3])
    new_atoms = atoms + d
    pos = jnp.array([0.3, 0.2, -0.1, 0.9, 0.1, 0.4])
    new_pos = corrsamples.correlated_samples(atoms, new_atoms, pos)
    np.testing.assert_allclose(np.asarray(new_pos - pos),
                               np.tile(np.asarray(d), 2), rtol=1e-5)
    jac = corrsamples.weights_jacobian(pos, atoms, new_atoms)
    np.testing.assert_allclose(float(jac), 1.0, rtol=1e-4)


def test_electron_near_atom_follows_it():
    """An electron sitting on atom a moves (almost) rigidly with atom a."""
    atoms = jnp.array([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    new_atoms = jnp.array([[0.2, 0.0, 0.0], [5.0, 0.0, 0.0]])
    pos = jnp.array([0.01, 0.0, 0.0])  # electron at atom 0
    new_pos = corrsamples.correlated_samples(atoms, new_atoms, pos)
    np.testing.assert_allclose(float(new_pos[0] - pos[0]), 0.2, atol=1e-4)


def test_swct_matches_direct_displaced_evaluation(tmp_path):
    """The SWCT-weighted energy at a displaced geometry must agree with a
    direct |psi|^2 sampling at that geometry using the same wavefunction
    (validated to ~2 mHa on a 200-iter H2 run; loose tolerance here)."""
    import jax
    from aiqmc_tpu import config as config_lib, train, vmc_eval
    from aiqmc_tpu.hamiltonian import local_energy as ae
    from aiqmc_tpu.models.network import AINetData
    from aiqmc_tpu.sampling import drift_diffusion

    cfg = config_lib.default()
    cfg.system.atoms = np.array([[0.0, 0.0, -0.7], [0.0, 0.0, 0.7]])
    cfg.system.charges = np.array([1.0, 1.0])
    cfg.system.spins = np.array([1.0, -1.0])
    cfg.batch_size = 256
    cfg.optim.iterations = 100
    cfg.mcmc.tstep = 0.3
    cfg.mcmc.steps = 10
    cfg.mcmc.burn_in = 100
    cfg.network.hidden_dims = ((8, 4), (8, 4))
    cfg.network.hidden_dims_ynlm = (4, 4)
    cfg.debug.deterministic = True
    cfg.log.save_path = str(tmp_path)
    cfg.log.save_frequency = 1e9
    res = train.train(cfg)
    net, params, data = res.network, res.params, res.data
    charges = jnp.array([1.0, 1.0])

    def make_le(atoms_):
        return ae.local_energy(net.apply, charges, (1, 1))

    new_atoms = jnp.array([[0.0, 0.0, -0.75], [0.0, 0.0, 0.75]])
    key = jax.random.PRNGKey(7)
    _, energies = vmc_eval.correlated_energy_sweep(
        net.apply, make_le, params, key, data, [new_atoms])
    swct = float(energies[0].real)

    data2 = AINetData(positions=data.positions, spins=data.spins,
                      atoms=new_atoms, charges=charges)
    mc = jax.jit(drift_diffusion.main_monte_carlo(
        net.apply, tstep=0.3, ndim=3, nelectrons=2, nsteps=20, batch_size=256))
    for _ in range(15):
        key, sk = jax.random.split(key)
        data2, _ = mc(params, data2, sk)
    le2 = make_le(new_atoms)
    es = []
    for _ in range(6):
        key, sk = jax.random.split(key)
        data2, _ = mc(params, data2, sk)
        m, _ = vmc_eval.evaluate_energy(le2, params, sk, data2)
        es.append(float(m.real))
    direct = float(np.mean(es))
    np.testing.assert_allclose(swct, direct, atol=0.03)
