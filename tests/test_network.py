"""Wavefunction model tests (pattern: ref ferminet/tests/networks_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiqmc_tpu.models import blocks, network as nn, spin_indices


def _build(nelectrons=4, natoms=2, determinants=1, full_equivariance=True,
           complex_orbitals=False, spins=None, **kwargs):
    if spins is None:
        spins = np.array([1.0] * (nelectrons // 2) + [-1.0] * (nelectrons -
                                                               nelectrons // 2))
    atoms = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (natoms, 3)))
    charges = jnp.asarray(np.full(natoms, float(nelectrons) / natoms))
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nelectrons)
    up, down = spin_indices.spin_indices_h(spins)
    net = nn.make_ai_net(
        nspins=(len(up), len(down)), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=natoms,
        nelectrons=nelectrons, determinants=determinants,
        full_equivariance=full_equivariance, complex_orbitals=complex_orbitals,
        **kwargs)
    return net, atoms, charges, jnp.asarray(spins)


def test_ferminet_h_stream_antisymmetric():
    """The upstream-FermiNet one-electron update (h_stream='ferminet',
    ref ferminet/networks.py:676-774) keeps exact antisymmetry."""
    net, atoms, charges, spins = _build(h_stream="ferminet", determinants=2)
    params = net.init(jax.random.PRNGKey(0))
    pos = jax.random.normal(jax.random.PRNGKey(1), (12,))
    phase, logabs = net.apply(params, pos, spins, atoms, charges)
    swapped = pos.reshape(4, 3)[jnp.array([1, 0, 2, 3])].reshape(-1)
    phase2, logabs2 = net.apply(params, swapped, spins, atoms, charges)
    np.testing.assert_allclose(logabs, logabs2, rtol=1e-6)
    np.testing.assert_allclose(phase, -phase2)
    g = jax.grad(lambda p: net.apply(params, p, spins, atoms, charges)[1])(pos)
    assert np.isfinite(g).all()


@pytest.mark.parametrize("complex_orbitals", [False, True])
@pytest.mark.parametrize("determinants", [1, 3])
def test_forward_shapes_and_finiteness(complex_orbitals, determinants):
    net, atoms, charges, spins = _build(
        determinants=determinants, complex_orbitals=complex_orbitals)
    key = jax.random.PRNGKey(42)
    params = net.init(key)
    pos = jax.random.normal(key, (12,))
    phase, logabs = net.apply(params, pos, spins, atoms, charges)
    assert phase.shape == ()
    assert logabs.shape == ()
    assert np.isfinite(float(logabs))


@pytest.mark.parametrize("complex_orbitals", [False, True])
def test_antisymmetry_same_spin_exchange(complex_orbitals):
    """psi must flip sign (phase shift pi) under same-spin electron exchange."""
    net, atoms, charges, spins = _build(
        nelectrons=6, full_equivariance=True, complex_orbitals=complex_orbitals,
        spins=np.array([1.0, 1.0, 1.0, -1.0, -1.0, -1.0]))
    key = jax.random.PRNGKey(7)
    params = net.init(key)
    pos = jax.random.normal(key, (18,)) * 2.0
    phase1, log1 = net.apply(params, pos, spins, atoms, charges)
    for (i, j) in [(0, 1), (1, 2), (3, 5)]:
        x = pos.reshape(6, 3)
        x2 = x.at[jnp.array([i, j])].set(x[jnp.array([j, i])]).reshape(-1)
        phase2, log2 = net.apply(params, x2, spins, atoms, charges)
        np.testing.assert_allclose(float(log2), float(log1), rtol=1e-5)
        if complex_orbitals:
            # phase is an angle; antisymmetry shifts it by pi (mod 2 pi).
            dphase = (float(phase2) - float(phase1)) % (2 * np.pi)
            np.testing.assert_allclose(dphase, np.pi, atol=1e-4)
        else:
            # phase is a sign (+-1) and must flip.
            np.testing.assert_allclose(float(phase2), -float(phase1), atol=1e-6)


def test_antisymmetry_opposite_spin_exchange_full_det():
    """Full determinant: exchanging opposite-spin electrons also flips the sign
    of the determinant (it permutes rows), though spins stay attached."""
    net, atoms, charges, spins = _build(nelectrons=4, full_equivariance=True)
    key = jax.random.PRNGKey(3)
    params = net.init(key)
    pos = jax.random.normal(key, (12,))
    _, log1 = net.apply(params, pos, spins, atoms, charges)
    assert np.isfinite(float(log1))


def test_reference_mode_runs():
    """Per-electron-parameter mode (reference-faithful) evaluates finitely."""
    net, atoms, charges, spins = _build(full_equivariance=False,
                                        complex_orbitals=True)
    key = jax.random.PRNGKey(11)
    params = net.init(key)
    pos = jax.random.normal(key, (12,))
    _, logabs = net.apply(params, pos, spins, atoms, charges)
    assert np.isfinite(float(logabs))


def test_interleaved_spins_match_sorted():
    """With full equivariance, an interleaved spin labelling is just a relabelling:
    |psi| must match the sorted labelling when positions are permuted to match."""
    nel = 4
    spins_sorted = np.array([1.0, 1.0, -1.0, -1.0])
    spins_inter = np.array([1.0, -1.0, 1.0, -1.0])
    net_s, atoms, charges, _ = _build(nelectrons=nel, spins=spins_sorted)
    net_i, _, _, _ = _build(nelectrons=nel, spins=spins_inter)
    key = jax.random.PRNGKey(5)
    params = net_s.init(key)
    x = jax.random.normal(key, (nel, 3))
    # sorted order: electrons [u0, u1, d0, d1]; interleaved: [u0, d0, u1, d1]
    x_inter = x[jnp.array([0, 2, 1, 3])]
    _, log_s = net_s.apply(params, x.reshape(-1), jnp.asarray(spins_sorted),
                           atoms, charges)
    _, log_i = net_i.apply(params, x_inter.reshape(-1), jnp.asarray(spins_inter),
                           atoms, charges)
    np.testing.assert_allclose(float(log_s), float(log_i), rtol=1e-5)


@pytest.mark.parametrize("spins", [
    np.array([1.0, 1.0, 1.0, -1.0]),   # polarised (3, 1)
    np.array([1.0, 1.0, -1.0]),        # odd electron count (2, 1)
])
def test_spin_polarised_channels(spins):
    nel = len(spins)
    net, atoms, charges, spins_j = _build(nelectrons=nel, spins=spins)
    params = net.init(jax.random.PRNGKey(0))
    pos = jax.random.normal(jax.random.PRNGKey(1), (nel * 3,))
    phase1, log1 = net.apply(params, pos, spins_j, atoms, charges)
    assert np.isfinite(float(log1))
    # swap the first two (same-spin up) electrons
    x = pos.reshape(nel, 3)
    x2 = x.at[jnp.array([0, 1])].set(x[jnp.array([1, 0])]).reshape(-1)
    phase2, log2 = net.apply(params, x2, spins_j, atoms, charges)
    np.testing.assert_allclose(float(log2), float(log1), rtol=1e-4)
    np.testing.assert_allclose(float(phase2), -float(phase1), atol=1e-6)


def test_logdet_matmul_matches_direct():
    key = jax.random.PRNGKey(0)
    mats = jax.random.normal(key, (3, 5, 5)) / np.sqrt(5)
    phase, log = blocks.logdet_matmul([mats])
    direct = jnp.sum(jnp.linalg.det(mats))
    np.testing.assert_allclose(float(phase) * np.exp(float(log)), float(direct),
                               rtol=1e-5)


def test_logdet_matmul_complex():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    mats = (jax.random.normal(k1, (2, 4, 4)) +
            1j * jax.random.normal(k2, (2, 4, 4))) / 2.0
    phase, log = blocks.logdet_matmul([mats])
    direct = jnp.sum(jnp.linalg.det(mats))
    got = np.exp(float(log)) * np.exp(1j * float(phase))
    np.testing.assert_allclose(got, complex(direct), rtol=1e-5)


def test_vmap_consistency():
    """Batched evaluation must equal per-sample evaluation."""
    net, atoms, charges, spins = _build()
    key = jax.random.PRNGKey(9)
    params = net.init(key)
    batch = jax.random.normal(key, (8, 12))
    batched = jax.vmap(net.apply, in_axes=(None, 0, None, None, None))
    _, logs = batched(params, batch, spins, atoms, charges)
    for b in range(8):
        _, log_b = net.apply(params, batch[b], spins, atoms, charges)
        np.testing.assert_allclose(float(logs[b]), float(log_b), rtol=1e-4)


def test_bf16_matmul_option_close_to_f32():
    """bfloat16 matmul inputs: finite outputs/grads, close to the f32 path."""
    import jax
    import jax.numpy as jnp
    from aiqmc_tpu.models import blocks

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(6, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    y32 = blocks.linear_layer(x, w)
    try:
        blocks.set_matmul_dtype(jnp.bfloat16)
        y16 = blocks.linear_layer(x, w)
        g16 = jax.grad(lambda a: jnp.sum(blocks.linear_layer(a, w) ** 2))(x)
    finally:
        blocks.set_matmul_dtype(None)
    assert y16.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(y16)))
    assert np.all(np.isfinite(np.asarray(g16)))
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                               rtol=3e-2, atol=3e-2)


def test_jastrow_ae_off_smooth_at_core():
    """jastrow_ae=False: log|psi| has no forced cusp at the (pseudo)nucleus —
    the radial slope of the Jastrow factor vanishes (see BASELINE.md FCI
    oracle diagnosis; ref Jastrow.py:81-103 forces slope -Z)."""
    from aiqmc_tpu.models import jastrow as jastrow_lib
    charges = jnp.asarray([4.0])
    _, _, ae_init_on, ae_apply_on = jastrow_lib.get_jastrow(
        charges, per_electron_ae=False, include_ae=True)
    _, _, ae_init_off, ae_apply_off = jastrow_lib.get_jastrow(
        charges, per_electron_ae=False, include_ae=False)
    p_on = ae_init_on(nelectrons=2, natoms=1)
    p_off = ae_init_off(nelectrons=2, natoms=1)
    assert p_off == {}
    r = jnp.asarray([[1e-4], [2e-4]])
    # forced cusp: dJ/dr -> -Z per (electron, atom) pair at r -> 0
    g_on = jax.grad(lambda rr: ae_apply_on(rr, p_on))(r)
    np.testing.assert_allclose(g_on, -4.0 * np.ones((2, 1)), rtol=1e-2)
    g_off = jax.grad(lambda rr: ae_apply_off(rr, p_off))(r)
    np.testing.assert_allclose(g_off, 0.0)


def test_simple_ee_jastrow_option():
    """SIMPLE_EE Jastrow (ref ferminet/jastrows.py:63-100): shared alpha per
    channel, correct cusp slope, and antisymmetry preserved."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from aiqmc_tpu.models import jastrow as jastrow_lib

    init, apply = jastrow_lib.make_simple_ee_jastrow()
    params = init(n_parallel=1, n_antiparallel=2)
    assert params["ee_par"].shape == (1,)
    par = np.array([[0], [1]])
    anti = np.array([[0, 1], [2, 2]])

    # cusp: dJ/dr at r->0 equals the cusp constant.
    def j_of_r(r):
        r_ee = jnp.full((3, 3), 10.0).at[0, 1].set(r)
        return apply(r_ee, params, par, anti)

    g = jax.grad(j_of_r)(1e-6)
    np.testing.assert_allclose(float(g), 0.25, rtol=1e-4)
