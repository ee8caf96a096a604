"""AD-SWCT interatomic force tests (aiqmc_tpu/forces.py).

The estimator is jax.grad of the SWCT correlated-sample energy
(corrsamples.py — capability the reference uses for displaced-geometry
energies only), so the tests pin (a) the exact-psi zero-variance property,
(b) the per-walker decomposition against the direct gradient of
make_correlated_energy, (c) finite differences, (d) the translation sum rule.
"""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import corrsamples, forces
from aiqmc_tpu.hamiltonian import local_energy as le_lib
from aiqmc_tpu.models import network as nn, spin_indices
from aiqmc_tpu.models.network import AINetData


def _hydrogen_stub():
    def f(params, pos, spins, atoms, charges):
        del params, spins, charges
        r = jnp.linalg.norm(pos - atoms[0])
        return jnp.ones(()), -r

    return f


def test_force_exact_hydrogen_is_zero_variance():
    """Exact psi = e^{-r}: E_L is constant and the warp transports electrons
    rigidly with the nucleus, so every per-walker force sample is exactly 0
    (the Hellmann-Feynman 1/r^2 term is cancelled analytically by autodiff
    through the warp, not just in the mean)."""
    f = _hydrogen_stub()
    atoms = jnp.zeros((1, 3))
    charges = jnp.ones((1,))
    e_l = le_lib.local_energy(f, charges, (1, 0), complex_output=False)
    pos = jax.random.normal(jax.random.PRNGKey(0), (16, 3))
    data = AINetData(positions=pos, spins=jnp.ones((1,)), atoms=atoms,
                     charges=charges)
    force_samples = forces.make_force_samples(f, e_l)
    fs, e = force_samples(None, jax.random.PRNGKey(1), data)
    np.testing.assert_allclose(np.asarray(e), -0.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fs), 0.0, atol=5e-4)


def _h2_net(bond=1.4, nwalkers=12):
    nel = 2
    spins = np.array([1.0, -1.0])
    atoms = jnp.asarray([[0.0, 0.0, -bond / 2], [0.0, 0.0, bond / 2]])
    charges = jnp.ones((2,))
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nel)
    up, down = spin_indices.spin_indices_h(spins)
    net = nn.make_ai_net(
        nspins=(1, 1), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=2,
        nelectrons=nel, full_equivariance=True, complex_orbitals=False,
        hidden_dims=((16, 4), (16, 4)), hidden_dims_Ynlm=(6, 6),
        determinants=2)
    params = net.init(jax.random.PRNGKey(3))
    pos = 0.8 * jax.random.normal(jax.random.PRNGKey(4), (nwalkers, nel * 3))
    data = AINetData(positions=pos, spins=jnp.asarray(spins), atoms=atoms,
                     charges=charges)
    e_l = le_lib.local_energy(net.apply, charges, (1, 1),
                              complex_output=False)
    return net, params, data, e_l


def test_force_matches_gradient_of_correlated_energy():
    """The per-walker decomposition -(dE_i + (E_i - Ebar) dw_i) averages to
    exactly -grad of make_correlated_energy at zero displacement (same
    estimator, factored for error bars)."""
    net, params, data, e_l = _h2_net()
    key = jax.random.PRNGKey(5)

    force = forces.make_force(net.apply, e_l)
    f_mean, f_sem, _ = force(params, key, data)

    corr = corrsamples.make_correlated_energy(net.apply, e_l)
    grad_e = jax.grad(
        lambda new_atoms: corr(params, key, data, new_atoms)[0])(data.atoms)
    np.testing.assert_allclose(np.asarray(f_mean), -np.asarray(grad_e),
                               rtol=1e-4, atol=1e-5)
    assert np.all(np.isfinite(np.asarray(f_sem)))


def test_force_matches_finite_difference():
    """Independent FD check along a random direction: the AD force projects
    onto -dE_swct/dt for atoms + t*v (f32 tolerances)."""
    net, params, data, e_l = _h2_net()
    key = jax.random.PRNGKey(6)
    corr = corrsamples.make_correlated_energy(net.apply, e_l)
    v = jax.random.normal(jax.random.PRNGKey(7), data.atoms.shape)
    v = v / jnp.linalg.norm(v)

    force = forces.make_force(net.apply, e_l)
    f_mean, _, _ = force(params, key, data)
    ad = float(jnp.sum(f_mean * v))

    d = 3e-3
    ep = float(corr(params, key, data, data.atoms + d * v)[0])
    em = float(corr(params, key, data, data.atoms - d * v)[0])
    fd = -(ep - em) / (2 * d)
    np.testing.assert_allclose(ad, fd, rtol=5e-3, atol=2e-3)


def test_force_translation_sum_rule():
    """Uniformly translating every atom leaves E and the SWCT weights exactly
    invariant (omega rows sum to 1), so each walker's force samples sum to
    zero over atoms — machine precision, not just statistically."""
    net, params, data, e_l = _h2_net()
    force_samples = forces.make_force_samples(net.apply, e_l)
    fs, _ = force_samples(params, jax.random.PRNGKey(8), data)
    total = np.asarray(jnp.sum(fs, axis=1))  # (batch, 3)
    np.testing.assert_allclose(total, 0.0, atol=5e-4)


def test_force_walker_weights():
    """DMC-weighted composition: replicating a walker twice equals giving it
    weight 2 (the weighted path is the population-weight contract)."""
    net, params, data, e_l = _h2_net()
    key = jax.random.PRNGKey(9)
    force = forces.make_force(net.apply, e_l)

    # Duplicate walker 0 explicitly...
    pos2 = jnp.concatenate([data.positions[:1], data.positions], axis=0)
    data2 = AINetData(positions=pos2, spins=data.spins, atoms=data.atoms,
                      charges=data.charges)
    # (fold the same per-walker keys: use a fixed key so local energies with
    # identical positions agree — the AE local energy ignores the key)
    f_dup, _, _ = force(params, key, data2)

    w = jnp.ones((data.positions.shape[0],)).at[0].set(2.0)
    f_w, _, _ = force(params, key, data, walker_weights=w)
    np.testing.assert_allclose(np.asarray(f_w), np.asarray(f_dup),
                               rtol=1e-4, atol=1e-5)


def test_evaluate_forces_sharded_matches_single_device():
    """vmc_eval.evaluate_forces (GSPMD over the 8-virtual-device mesh) equals
    the plain single-device estimator on the same keys.

    Uses a device-multiple population (16 walkers on the 8-virtual-device
    mesh) so the eval trim policy (below) does not change the sample set.
    """
    from aiqmc_tpu import vmc_eval

    net, params, data, e_l = _h2_net(nwalkers=16)
    key = jax.random.PRNGKey(10)

    force = forces.make_force(net.apply, e_l)
    f_single, _, _ = force(params, key, data)

    f_mesh, sem, samples = vmc_eval.evaluate_forces(
        net.apply, e_l, params, key, data)
    assert samples.shape == (data.positions.shape[0], 2, 3)
    np.testing.assert_allclose(np.asarray(f_mesh), np.asarray(f_single),
                               rtol=2e-4, atol=2e-5)


def test_evaluate_forces_trims_to_device_multiple():
    """Eval trim policy (one policy, stated): TRAINING raises on populations
    that do not divide the mesh (parallel/mesh.py walker_mesh); EVAL trims to
    the largest device multiple — walkers are iid so the drop is statistically
    free — and surfaces the kept count through the returned samples array.
    12 walkers on 8 virtual devices -> 8 kept; the result must equal the
    single-device estimator run on exactly those 8 walkers."""
    from aiqmc_tpu import vmc_eval
    from aiqmc_tpu.models.network import AINetData as Data

    net, params, data, e_l = _h2_net(nwalkers=12)
    key = jax.random.PRNGKey(11)

    f_mesh, _, samples = vmc_eval.evaluate_forces(
        net.apply, e_l, params, key, data)
    ndev = jax.device_count()
    kept = (data.positions.shape[0] // ndev) * ndev
    assert samples.shape == (kept, 2, 3)

    trimmed = Data(positions=data.positions[:kept], spins=data.spins,
                   atoms=data.atoms, charges=data.charges)
    force = forces.make_force(net.apply, e_l)
    f_single, _, _ = force(params, key, trimmed)
    np.testing.assert_allclose(np.asarray(f_mesh), np.asarray(f_single),
                               rtol=2e-4, atol=2e-5)


def test_force_fwd_mode_matches_rev():
    """mode="fwd" (per-coordinate jvp, the on-chip memory path — the rev
    residuals measure ~21G for C2 ccECP, runs/c2_forces_r5{b,d}.log) must
    reproduce mode="rev" per-walker samples exactly (same estimator, other
    AD direction)."""
    net, params, data, e_l = _h2_net()
    key = jax.random.PRNGKey(3)
    fs_rev, e_rev = forces.make_force_samples(net.apply, e_l, "rev")(
        params, key, data)
    fs_fwd, e_fwd = forces.make_force_samples(net.apply, e_l, "fwd")(
        params, key, data)
    np.testing.assert_allclose(np.asarray(e_fwd), np.asarray(e_rev),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fs_fwd), np.asarray(fs_rev),
                               rtol=2e-3, atol=2e-4)
