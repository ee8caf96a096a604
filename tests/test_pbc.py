"""PBC tests: feature periodicity, Ewald invariance, cell wrapping, k-points
(pattern: ref ferminet/pbc/tests/features_test.py:28-89 and
pbc/tests/hamiltonian_test.py:31-96)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiqmc_tpu.models import network as nn, spin_indices
from aiqmc_tpu.pbc import enforce, ewald, ewald2d, features, kpoints


LATTICE = jnp.asarray(np.diag([3.0, 4.0, 5.0]))


def test_enforce_pbc_wraps_into_cell():
    pos = jnp.array([3.5, -1.0, 12.0, 0.5, 0.5, 0.5])
    wrapped = enforce.enforce_pbc(LATTICE, pos)
    x = np.asarray(wrapped).reshape(-1, 3)
    assert (x >= 0).all()
    assert (x <= np.diag(np.asarray(LATTICE))).all()
    np.testing.assert_allclose(x[0], [0.5, 3.0, 2.0], atol=1e-6)


def test_minimum_image():
    disp = jnp.array([[2.9, 0.1, 4.9]])
    mi = np.asarray(enforce.minimum_image(LATTICE, disp))
    np.testing.assert_allclose(mi[0], [-0.1, 0.1, -0.1], atol=1e-5)


def test_periodic_features_invariant_under_lattice_translation():
    natoms, nelec = 2, 3
    layer = features.make_pbc_feature_layer(natoms, lattice=LATTICE)
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.uniform(0, 3, (nelec, 3)))
    atoms = jnp.asarray(rng.uniform(0, 3, (natoms, 3)))

    def feats(p):
        ae = p[:, None, :] - atoms[None]
        ee = p[None] - p[:, None]
        return layer.apply(ae, None, ee, None)

    f1 = feats(pos)
    # translate one electron by a lattice vector
    pos2 = pos.at[1].add(jnp.asarray(LATTICE)[0] + 2 * jnp.asarray(LATTICE)[2])
    f2 = feats(pos2)
    for a, b in zip(f1, f2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_ewald_invariant_under_lattice_translation():
    atoms = jnp.array([[0.1, 0.2, 0.3], [1.5, 2.0, 2.5]])
    charges = jnp.array([2.0, 2.0])
    pot = ewald.make_ewald_potential(LATTICE, atoms, charges,
                                     truncation_limit=4,
                                     include_heg_background=False)
    rng = np.random.RandomState(1)
    pos = jnp.asarray(rng.uniform(0, 3, (4, 3)))

    def energy(p):
        ae = p[:, None, :] - atoms[None]
        ee = p[None] - p[:, None]
        return pot(ae, ee)

    e1 = float(energy(pos))
    pos2 = pos.at[2].add(jnp.asarray(LATTICE)[1])
    e2 = float(energy(pos2))
    np.testing.assert_allclose(e1, e2, rtol=1e-4)


def test_ewald_matches_isolated_coulomb_in_large_cell():
    """In a huge cell the Ewald energy approaches the bare Coulomb energy."""
    big = jnp.eye(3) * 60.0
    atoms = jnp.array([[0.0, 0.0, 0.0]])
    charges = jnp.array([2.0])
    pot = ewald.make_ewald_potential(big, atoms, charges, truncation_limit=3,
                                     include_heg_background=False)
    pos = jnp.array([[0.5, 0.0, 0.0], [0.0, 0.8, 0.0]])
    ae = pos[:, None, :] - atoms[None]
    ee = pos[None] - pos[:, None]
    got = float(pot(ae, ee))
    want = (-2.0 / 0.5 - 2.0 / 0.8
            + 1.0 / float(jnp.linalg.norm(pos[0] - pos[1])))
    np.testing.assert_allclose(got, want, rtol=2e-2)


def test_ewald2d_invariant_under_inplane_translation():
    lat = jnp.asarray(np.diag([3.0, 3.0, 20.0]))
    atoms = jnp.array([[0.5, 0.5, 0.0]])
    charges = jnp.array([2.0])
    pot = ewald2d.make_ewald2d_potential(lat, atoms, charges, gmax=4, nlat=3)
    rng = np.random.RandomState(2)
    pos = jnp.asarray(rng.uniform(0, 2, (2, 3)))

    def energy(p):
        ae = p[:, None, :] - atoms[None]
        ee = p[None] - p[:, None]
        return pot(ae, ee)

    e1 = float(energy(pos))
    pos2 = pos.at[0].add(jnp.array([3.0, 0.0, 0.0]))
    e2 = float(energy(pos2))
    np.testing.assert_allclose(e1, e2, rtol=1e-3)


def test_ewald2d_matches_isolated_in_large_cell():
    lat = jnp.asarray(np.diag([80.0, 80.0, 1.0]))
    atoms = jnp.array([[0.0, 0.0, 0.0]])
    charges = jnp.array([1.0])
    pot = ewald2d.make_ewald2d_potential(lat, atoms, charges, gmax=4, nlat=2)
    pos = jnp.array([[0.7, 0.0, 0.3], [0.0, -0.9, 1.1]])
    ae = pos[:, None, :] - atoms[None]
    ee = pos[None] - pos[:, None]
    got = float(pot(ae, ee))
    r0 = float(jnp.linalg.norm(pos[0]))
    r1 = float(jnp.linalg.norm(pos[1]))
    ree = float(jnp.linalg.norm(pos[0] - pos[1]))
    want = -1.0 / r0 - 1.0 / r1 + 1.0 / ree
    np.testing.assert_allclose(got, want, rtol=5e-2)


def test_kpoints_grid():
    kp = kpoints.make_kpoints(np.eye(3), np.diag([2, 2, 1]))
    assert kp.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(kp)[-1], [0.5, 0.5, 0.0])


def test_pbc_network_periodic():
    """log|psi| must be invariant when any electron is translated by a lattice
    vector (periodic ansatz)."""
    nelec, natoms = 4, 2
    spins = np.array([1.0, 1.0, -1.0, -1.0])
    atoms = jnp.asarray(np.random.RandomState(3).uniform(0, 2, (natoms, 3)))
    charges = jnp.asarray([2.0, 2.0])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nelec)
    up, down = spin_indices.spin_indices_h(spins)
    net = nn.make_ai_net(
        nspins=(2, 2), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=natoms,
        nelectrons=nelec, full_equivariance=True, complex_orbitals=False,
        bounded_envelope=True, regular_harmonics=True, lattice=LATTICE)
    key = jax.random.PRNGKey(0)
    params = net.init(key)
    pos = jax.random.uniform(key, (nelec, 3), minval=0.0, maxval=2.5)
    _, log1 = net.apply(params, pos.reshape(-1), jnp.asarray(spins), atoms,
                        charges)
    pos2 = pos.at[2].add(jnp.asarray(LATTICE)[0] - jnp.asarray(LATTICE)[2])
    _, log2 = net.apply(params, pos2.reshape(-1), jnp.asarray(spins), atoms,
                        charges)
    np.testing.assert_allclose(float(log1), float(log2), rtol=1e-4)


def test_pbc_network_smooth_r_periodic_and_smooth():
    """pbc_smooth_r=True: periodicity holds AND grad(log|psi|) is continuous
    across the Wigner-Seitz boundary, where the minimum image kinks."""
    nelec, natoms = 2, 1
    spins = np.array([1.0, -1.0])
    lattice = jnp.asarray(LATTICE)
    atoms = jnp.zeros((natoms, 3))
    charges = jnp.asarray([2.0])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nelec)
    up, down = spin_indices.spin_indices_h(spins)

    def build(smooth):
        return nn.make_ai_net(
            nspins=(1, 1), charges=charges, parallel_indices=par,
            antiparallel_indices=anti, spin_up_indices=up,
            spin_down_indices=down, n_parallel=n_par, n_antiparallel=n_anti,
            ndim=3, natoms=natoms, nelectrons=nelec, full_equivariance=True,
            complex_orbitals=False, bounded_envelope=True,
            regular_harmonics=True, lattice=lattice, pbc_smooth_r=smooth)

    net = build(True)
    params = net.init(jax.random.PRNGKey(0))
    pos = jnp.asarray([0.3, 0.4, 0.5, 1.1, 0.2, 0.9])
    _, log1 = net.apply(params, pos, jnp.asarray(spins), atoms, charges)
    pos2 = pos.at[3:6].add(lattice[1])
    _, log2 = net.apply(params, pos2, jnp.asarray(spins), atoms, charges)
    np.testing.assert_allclose(float(log1), float(log2), rtol=1e-4)

    # Gradient continuity across the WS boundary along x: electron 1 crosses
    # half a lattice vector away from electron 0. Sample grad on both sides
    # of the boundary; the smooth variant must match to O(eps), the minimum
    # image variant jumps by O(1).
    half = lattice[0] / 2.0
    eps = 1e-3

    def jump(network):
        g = jax.grad(lambda p: network.apply(params, p, jnp.asarray(spins),
                                             atoms, charges)[1])
        base = jnp.asarray([0.0, 0.1, 0.2, 0.0, 0.15, 0.1]) \
            + jnp.concatenate([jnp.zeros(3), half])
        lo = base.at[3].add(-eps)
        hi = base.at[3].add(eps)
        return float(jnp.max(jnp.abs(g(hi) - g(lo))))

    net_mi = build(False)
    assert jump(net) < 30 * eps, "smooth variant must be C^1 at the boundary"
    assert jump(net_mi) > jump(net), "minimum image should kink more"


def test_ewald_nacl_madelung_constant():
    """Absolute-scale oracle: the atom-atom Ewald energy of the 8-atom
    rock-salt cell must equal -alpha * N_pairs / d with the literature
    Madelung constant alpha = 1.7475645946 (d = nearest-neighbour distance).
    Validates the pair - madelung bookkeeping for neutral systems exactly
    (the translation/dilute-limit tests cannot see constant offsets)."""
    import jax
    import numpy as np
    from aiqmc_tpu.pbc import ewald as ewald_lib

    a = 2.0
    lat = a * jnp.eye(3)
    fcc = np.array([[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0]])
    atoms = np.concatenate([fcc * a, (fcc + [.5, 0, 0]) * a])
    charges = np.array([1.0] * 4 + [-1.0] * 4)

    es, xi = ewald_lib.make_ewald_sum(lat, truncation_limit=8)
    aa = (atoms[None] - atoms[:, None]).reshape(-1, 3)
    v = np.array(jax.vmap(es)(jnp.asarray(aa))).reshape(8, 8)
    np.fill_diagonal(v, 0.0)
    vm = v - float(xi) * (1 - np.eye(8))
    q = charges[:, None] * charges[None]
    e_aa = 0.5 * float((q * vm).sum())
    alpha = 1.7475645946
    np.testing.assert_allclose(e_aa, 4 * (-alpha / (a / 2)), rtol=2e-6)
