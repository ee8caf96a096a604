"""Observable estimator tests."""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import observables
from aiqmc_tpu.models import network as nn, spin_indices
from aiqmc_tpu.models.network import AINetData


def _net(nelec=4):
    spins = np.array([1.0] * (nelec // 2) + [-1.0] * (nelec - nelec // 2))
    atoms = jnp.zeros((1, 3))
    charges = jnp.asarray([float(nelec)])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nelec)
    up, down = spin_indices.spin_indices_h(spins)
    net = nn.make_ai_net(
        nspins=(len(up), len(down)), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=1,
        nelectrons=nelec, full_equivariance=True, complex_orbitals=False)
    return net, jnp.asarray(spins), atoms, charges


def test_s2_one_electron():
    def f(params, pos, spins, atoms, charges):
        return jnp.ones(()), -jnp.sum(pos ** 2)

    s2 = observables.make_s2(f, (1, 0))
    data = AINetData(positions=jnp.ones((3,)), spins=jnp.array([1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    np.testing.assert_allclose(float(s2(None, data)), 0.75)


def test_s2_finite_on_network():
    net, spins, atoms, charges = _net(4)
    params = net.init(jax.random.PRNGKey(0))
    pos = jax.random.normal(jax.random.PRNGKey(1), (12,))
    data = AINetData(positions=pos, spins=spins, atoms=atoms, charges=charges)
    s2 = observables.make_s2(net.apply, (2, 2))
    val = float(s2(params, data))
    assert np.isfinite(val)


def test_dipole():
    d = observables.make_dipole()
    pos = jnp.array([1.0, 0.0, 0.0, 0.0, 2.0, 0.0])
    data = AINetData(positions=pos, spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    np.testing.assert_allclose(np.asarray(d(None, data)), [-1.0, -2.0, 0.0])


def test_batched_observable():
    d = observables.make_observable_fns(observables.make_dipole())
    pos = jnp.stack([jnp.array([1.0, 0, 0, 0, 0, 0]),
                     jnp.array([3.0, 0, 0, 0, 0, 0])])
    data = AINetData(positions=pos, spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    np.testing.assert_allclose(np.asarray(d(None, data)), [-2.0, 0.0, 0.0])


def test_density_histogram():
    dens = observables.make_density(bins=10, limit=5.0)
    pos = jnp.array([[1.0, 0, 0, 0, 3.0, 0]])
    data = AINetData(positions=pos, spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.ones((1,)))
    hist = np.asarray(dens(data))
    assert hist.sum() == 2
    assert hist[2] == 1  # r = 1.0 in bin [1.0, 1.5)


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


def test_s2_states_one_state_reduces_to_scalar():
    """K=1 state-matrix S^2 (independent path) == the plain scalar estimator:
    the 1x1 solve is a division and the batched swap machinery must reproduce
    the single-configuration swap sum exactly."""
    net, spins, atoms, charges = _net(4)
    params = net.init(jax.random.PRNGKey(0))
    pos = jax.random.normal(jax.random.PRNGKey(1), (12,))
    data = AINetData(positions=pos, spins=spins, atoms=atoms, charges=charges)
    want = float(observables.make_s2(net.apply, (2, 2))(params, data))
    got = observables.make_s2_states(net, (2, 2), states=1, shared=False)(
        [params], data)
    assert got.shape == (1, 1)
    np.testing.assert_allclose(float(got[0, 0]), want, rtol=1e-5)


def test_s2_states_trace_equals_total_ansatz_swaps():
    """tr(M^{-1} S^2 M) == sum_k [S^2_k Psi]/Psi for Psi = det(M): the same
    row-linearity identity the NES-VMC energy matrix relies on, evaluated
    here by applying each spin swap to ONE configuration of the extended
    ansatz directly."""
    from aiqmc_tpu.models import excited

    spins = np.array([1.0, 1.0, -1.0])
    nel, states, ndets = 3, 2, 2
    nspins = (2, 1)
    atoms = jnp.zeros((1, 3))
    charges = jnp.array([3.0])
    base = _shared_net(nel, nspins, spins, charges, states * ndets)
    init, tot_apply = excited.make_shared_total_ansatz(base, states)
    params = init(jax.random.PRNGKey(3))
    positions = jax.random.normal(jax.random.PRNGKey(4), (states * nel * 3,))
    data = AINetData(positions=positions, spins=jnp.asarray(spins),
                     atoms=atoms, charges=charges)

    mat = observables.make_s2_states(base, nspins, states, shared=True)(
        params, data)
    assert mat.shape == (states, states)

    na, nb = nspins
    s2_diag = (na - nb) / 2 * ((na - nb) / 2 + 1) + nb
    sign0, log0 = tot_apply(params, positions, data.spins, atoms, charges)
    total = states * s2_diag
    x = positions.reshape(states, nel, 3)
    for k in range(states):
        for ia in range(na):
            for ib in range(nb):
                xk = x[k]
                new = xk.at[ia].set(xk[na + ib]).at[na + ib].set(xk[ia])
                xs = x.at[k].set(new).reshape(-1)
                s, l = tot_apply(params, xs, data.spins, atoms, charges)
                total -= float(sign0 * s * jnp.exp(l - log0))
    np.testing.assert_allclose(float(jnp.trace(mat)), total, rtol=1e-4)


def test_dipole_states_trace_is_exact():
    """tr(M^{-1} diag(m_d) M) = sum_j m_d(x_j) for any nonsingular M —
    the per-component trace of the dipole state matrix must equal the plain
    position sum over every configuration, to solver precision."""
    from aiqmc_tpu.models import excited  # noqa: F401  (exercises the import path)

    spins = np.array([1.0, -1.0])
    nel, states, ndets = 2, 2, 2
    atoms = jnp.zeros((1, 3))
    charges = jnp.array([2.0])
    base = _shared_net(nel, (1, 1), spins, charges, states * ndets)
    params = base.init(jax.random.PRNGKey(7))
    positions = jax.random.normal(jax.random.PRNGKey(8), (states * nel * 3,))
    data = AINetData(positions=positions, spins=jnp.asarray(spins),
                     atoms=atoms, charges=charges)
    mom = observables.make_dipole_states(base, states, shared=True)(
        params, data)
    assert mom.shape == (3, states, states)
    want = -positions.reshape(states * nel, 3).sum(axis=0)
    got = np.trace(np.asarray(mom), axis1=1, axis2=2)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-5)


def test_s2_angle_representation_matches_sign():
    """S^2 on a phase-ANGLE network (complex/pair/twisted-real mode) must
    equal the +-1-sign evaluation of the same wavefunction: spin swaps
    preserve sum_i r_i, so the plane-wave boost cancels in the swap ratio
    and cos(dphase) reduces to the sign product. Regression: the sign
    PRODUCT applied to angles is silently wrong."""
    from aiqmc_tpu.pbc import twist as twist_lib

    net, spins, atoms, charges = _net(4)
    params = net.init(jax.random.PRNGKey(0))
    pos = jax.random.normal(jax.random.PRNGKey(1), (12,))
    data = AINetData(positions=pos, spins=spins, atoms=atoms, charges=charges)
    want = float(observables.make_s2(net.apply, (2, 2))(params, data))

    twisted = twist_lib.apply_twist(twist_lib.real_to_angle(net),
                                    np.eye(3) * 5.0, (0.25, -0.25, 0.125))
    got = float(observables.make_s2(twisted.apply, (2, 2),
                                    complex_output=True)(params, data))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _write_excited_csv(path, energies_phys, dipole_phys, mixing, s2_diag):
    """Synthesise the train-loop CSV for trained states phi_i = sum_a A_ia psi_a.

    The logged NES estimator matrices converge to S^{-1}·<phi|O|phi> in the
    TRAINED basis; for orthonormal physical eigenstates psi with diagonal
    energies E and dipole matrix D that is A^{-T} E A^T / A^{-T} D A^T.
    """
    import csv as csv_mod

    ainv_t = np.linalg.inv(mixing).T
    emat = ainv_t @ np.diag(energies_phys) @ mixing.T
    k = len(energies_phys)
    row = {"energy": float(np.mean(energies_phys))}
    for i in range(k):
        row[f"energy_state_{i}"] = emat[i, i]
        row[f"s2_{i}{i}"] = s2_diag[i]
    for i in range(k):
        for j in range(k):
            row[f"energy_mat_{i}{j}"] = emat[i, j]
    for di, d in enumerate("xyz"):
        dmat = ainv_t @ dipole_phys[di] @ mixing.T
        for i in range(k):
            for j in range(k):
                row[f"dipole_{d}_{i}{j}"] = dmat[i, j]
    with open(path, "w", newline="") as f:
        w = csv_mod.DictWriter(f, fieldnames=list(row))
        w.writeheader()
        for _ in range(10):
            w.writerow(row)


def test_excited_state_summary(tmp_path):
    """excited_state_summary recovers physical excitations and |<0|r|k>|^2
    from estimator matrices logged in an arbitrarily MIXED (non-orthogonal)
    trained basis: the energy-matrix eigenvectors define the transform, and
    the O_0k*O_k0 product in that eigenbasis cancels all normalisations."""
    from aiqmc_tpu.utils import analysis_tools

    path = tmp_path / "train_states.csv"
    e_phys = np.array([-3.0, -2.5])
    # |<0|x|1>|^2 = 0.2^2 = 0.04 (symmetric physical dipole matrix).
    dip = [np.array([[0.0, 0.2], [0.2, 0.0]]), np.zeros((2, 2)),
           np.zeros((2, 2))]
    rng = np.random.default_rng(7)
    mixing = np.eye(2) + 0.3 * rng.standard_normal((2, 2))
    _write_excited_csv(path, e_phys, dip, mixing, s2_diag=[0.75, 2.0])

    out = analysis_tools.excited_state_summary(str(path), states=2)
    np.testing.assert_allclose(out["energies_eig"], e_phys, atol=1e-12)
    np.testing.assert_allclose(out["s2"], [0.75, 2.0])
    t = out["transitions"][0]
    np.testing.assert_allclose(t["excitation_ha"], 0.5, atol=1e-12)
    np.testing.assert_allclose(t["dipole_strength"], 0.04, atol=1e-10)
    np.testing.assert_allclose(t["oscillator_strength"],
                               2.0 / 3.0 * 0.5 * 0.04, atol=1e-10)


def test_excited_state_summary_degenerate_block(tmp_path):
    """Within an exactly degenerate multiplet the per-state strength split is
    basis-arbitrary, but the block SUM of O_0k*O_k0 is invariant and equals
    the total line strength into the multiplet (the Li 2P situation)."""
    from aiqmc_tpu.utils import analysis_tools

    path = tmp_path / "train_states.csv"
    e_phys = np.array([-7.5, -7.4, -7.4])
    # Physical strengths |<0|x|1>|^2 = 0.36, |<0|y|2>|^2 = 0.25 -> block 0.61.
    dx = np.zeros((3, 3)); dx[0, 1] = dx[1, 0] = 0.6
    dy = np.zeros((3, 3)); dy[0, 2] = dy[2, 0] = 0.5
    rng = np.random.default_rng(3)
    mixing = np.eye(3) + 0.25 * rng.standard_normal((3, 3))
    _write_excited_csv(path, e_phys, [dx, dy, np.zeros((3, 3))], mixing,
                       s2_diag=[0.75, 0.75, 0.75])

    out = analysis_tools.excited_state_summary(str(path), states=3)
    np.testing.assert_allclose(sorted(out["energies_eig"]), e_phys,
                               atol=1e-10)
    (blk,) = out["multiplets"]
    assert blk["states"] == [1, 2]
    np.testing.assert_allclose(blk["excitation_ha"], 0.1, atol=1e-10)
    np.testing.assert_allclose(blk["dipole_strength_total"], 0.61, atol=1e-9)
    np.testing.assert_allclose(blk["oscillator_strength_total"],
                               2.0 / 3.0 * 0.1 * 0.61, atol=1e-9)
