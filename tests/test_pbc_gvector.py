"""g-vector periodic input features (the AIQMC tree's own PBC variant).

Reference parity: ``AIQMCrelease3/PBC/nnPBC.py:104`` / ``PBC/PBCenvelope.py:
52-100`` expand every displacement over a grid of lattice images and feed the
raw displaced copies + norms. Ours wraps displacements to the fundamental
cell first, so the features — and hence the full periodic ansatz built from
them — are exactly invariant under lattice translations (the reference's
unwrapped stack loses invariance at the grid boundary; VERDICT round-3
missing #4 asked for this variant behind a flag plus this test).
"""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.models import network as nn, spin_indices
from aiqmc_tpu.pbc import features

LATTICE = jnp.asarray(np.diag([3.0, 4.0, 5.0]))


def _feats(layer, pos, atoms):
    ae = pos[:, None, :] - atoms[None]
    ee = pos[None] - pos[:, None]
    return layer.apply(ae, None, ee, None)


def test_gvector_feature_shapes():
    natoms, nelec, g_max = 2, 3, 1
    layer = features.make_gvector_feature_layer(
        natoms, lattice=LATTICE, g_max=g_max)
    (ae_dim, ee_dim), _ = layer.init()
    n_images = (2 * g_max + 1) ** 3
    assert ae_dim == natoms * n_images * 4
    assert ee_dim == n_images * 4
    rng = np.random.RandomState(0)
    ae_f, ee_f = _feats(layer, jnp.asarray(rng.uniform(0, 3, (nelec, 3))),
                        jnp.asarray(rng.uniform(0, 3, (natoms, 3))))
    assert ae_f.shape == (nelec, ae_dim)
    assert ee_f.shape == (nelec, nelec, ee_dim)
    # Coincident-pair features are exactly zero and gradient-safe.
    assert np.all(np.asarray(ee_f)[np.arange(nelec), np.arange(nelec)] == 0.0)


def test_gvector_features_invariant_under_lattice_translation():
    natoms, nelec = 2, 3
    layer = features.make_gvector_feature_layer(natoms, lattice=LATTICE,
                                                g_max=1)
    rng = np.random.RandomState(1)
    pos = jnp.asarray(rng.uniform(0, 3, (nelec, 3)))
    atoms = jnp.asarray(rng.uniform(0, 3, (natoms, 3)))
    f1 = _feats(layer, pos, atoms)
    pos2 = pos.at[1].add(jnp.asarray(LATTICE)[0] + 2 * jnp.asarray(LATTICE)[2])
    f2 = _feats(layer, pos2, atoms)
    for a, b in zip(f1, f2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_gvector_features_continuous_at_half_cell_boundary():
    """smooth=True (default): per-slot features are continuous when a
    fractional coordinate crosses +-1/2 — the minimum-image wrap jumps by a
    lattice vector there (ADVICE r4 medium). Straddle the boundary with an
    epsilon pair and compare; also confirm the ablation (smooth=False) really
    is discontinuous so the test discriminates."""
    natoms = 1
    atoms = jnp.zeros((natoms, 3))
    eps = 1e-6
    # Electron crossing x = L_x/2 = 1.5 (fractional +1/2 boundary).
    below = jnp.asarray([[1.5 - eps, 0.7, 0.9], [0.2, 0.3, 0.4]])
    above = jnp.asarray([[1.5 + eps, 0.7, 0.9], [0.2, 0.3, 0.4]])

    smooth = features.make_gvector_feature_layer(natoms, lattice=LATTICE,
                                                 g_max=1, smooth=True)
    f_lo = _feats(smooth, below, atoms)
    f_hi = _feats(smooth, above, atoms)
    for a, b in zip(f_lo, f_hi):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    wrap = features.make_gvector_feature_layer(natoms, lattice=LATTICE,
                                               g_max=1, smooth=False)
    g_lo = _feats(wrap, below, atoms)[0]
    g_hi = _feats(wrap, above, atoms)[0]
    assert np.max(np.abs(np.asarray(g_lo) - np.asarray(g_hi))) > 0.1


def test_gvector_smooth_features_invariant_under_lattice_translation():
    """The smooth map keeps exact lattice-translation invariance (it is
    periodic by construction, not by wrapping)."""
    natoms, nelec = 2, 3
    layer = features.make_gvector_feature_layer(natoms, lattice=LATTICE,
                                                g_max=1, smooth=True)
    rng = np.random.RandomState(7)
    pos = jnp.asarray(rng.uniform(0, 3, (nelec, 3)))
    atoms = jnp.asarray(rng.uniform(0, 3, (natoms, 3)))
    f1 = _feats(layer, pos, atoms)
    pos2 = pos.at[0].add(2 * jnp.asarray(LATTICE)[1] - jnp.asarray(LATTICE)[0])
    f2 = _feats(layer, pos2, atoms)
    for a, b in zip(f1, f2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_gvector_rescaled_features_finite_gradient():
    layer = features.make_gvector_feature_layer(
        1, lattice=LATTICE, g_max=1, rescale_inputs=True)
    atoms = jnp.zeros((1, 3))

    def scalar(p):
        ae_f, ee_f = _feats(layer, p.reshape(-1, 3), atoms)
        return jnp.sum(ae_f) + jnp.sum(ee_f)

    g = jax.grad(scalar)(jnp.asarray([0.3, 0.4, 0.5, 1.0, 1.1, 1.2]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_gvector_network_periodic_and_kinetic_finite():
    """The full ansatz built with pbc_features='gvector' stays periodic and
    its local kinetic energy is finite (exercises the network build path)."""
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
        bounded_envelope=True, regular_harmonics=True, lattice=LATTICE,
        pbc_features="gvector", pbc_gmax=1)
    key = jax.random.PRNGKey(0)
    params = net.init(key)
    pos = jax.random.uniform(key, (nelec, 3), minval=0.0, maxval=2.5)
    _, log1 = net.apply(params, pos.reshape(-1), jnp.asarray(spins), atoms,
                        charges)
    pos2 = pos.at[2].add(jnp.asarray(LATTICE)[0] - jnp.asarray(LATTICE)[2])
    _, log2 = net.apply(params, pos2.reshape(-1), jnp.asarray(spins), atoms,
                        charges)
    assert np.isfinite(float(log1))
    np.testing.assert_allclose(float(log1), float(log2), rtol=1e-4)

    def logabs(p):
        return net.apply(params, p, jnp.asarray(spins), atoms, charges)[1]

    g = jax.grad(logabs)(pos.reshape(-1))
    assert np.all(np.isfinite(np.asarray(g)))
