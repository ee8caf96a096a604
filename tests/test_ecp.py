"""Pseudopotential tests: quadrature exactness + analytic channel checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiqmc_tpu.hamiltonian import ecp
from aiqmc_tpu.models.network import AINetData

# C ccECP tables (ref example/single_atom_C/single_atom_C.py:13-23).
C_RN_LOCAL = np.array([[1.0, 3.0, 2.0]])
C_LOCAL_COES = np.array([[4.00000, 57.74008, -25.81955]])
C_LOCAL_EXPS = np.array([[14.43502, 8.39889, 7.38188]])
C_RN_NON_LOCAL = np.array([[[2.0, 2.0], [2.0, 2.0], [2.0, 2.0]]])
C_NON_LOCAL_COES = np.array([[[52.13345, 0], [0, 0], [0, 0]]])
C_NON_LOCAL_EXPS = np.array([[[7.76079, 0], [0, 0], [0, 0]]])


def test_quadrature_weights_normalised():
    _, w = ecp.fused_quadrature()
    np.testing.assert_allclose(w.sum(), 1.0, atol=5e-5)


@pytest.mark.parametrize("l", [1, 2, 3])
def test_quadrature_integrates_legendre_exactly(l):
    """The 50-point octahedral rule must annihilate P_l for l>=1 (spherical
    average of P_l(cos theta) is delta_l0) for arbitrary reference axes."""
    pts, w = ecp.fused_quadrature()
    pts = jnp.asarray(pts)
    w = jnp.asarray(w)
    rng = np.random.RandomState(0)
    for _ in range(3):
        u = rng.normal(size=3)
        u /= np.linalg.norm(u)
        cos_theta = pts @ jnp.asarray(u)
        p = ecp.legendre_stack(cos_theta, 3)
        integral = p @ w  # (4,)
        np.testing.assert_allclose(float(integral[0]), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(integral[l]), 0.0, atol=1e-6)


def test_icosahedral_quadrature_5_design():
    """The 12-point icosahedral rule is a spherical 5-design: weights sum to 1
    and P_l averages to 0 for l = 1..5 under arbitrary reference axes
    (ferminet-parity rule, ref ferminet/pseudopotential.py:100-168)."""
    pts, w = ecp.get_quadrature("icosahedral12")
    assert pts.shape == (12, 3)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-12)
    rng = np.random.RandomState(3)
    from numpy.polynomial import legendre as L
    for _ in range(3):
        u = rng.normal(size=3)
        u /= np.linalg.norm(u)
        x = pts @ u
        for l in range(1, 6):
            c = np.zeros(l + 1)
            c[l] = 1.0
            np.testing.assert_allclose(L.legval(x, c) @ w, 0.0, atol=1e-12)


@pytest.mark.parametrize("quad", ["msc50", "icosahedral12"])
def test_nonlocal_p_state_quadratures(quad):
    """Both rules get the p-state projections exactly (degree <= 2)."""
    nl0 = ecp.make_nonlocal_pp_energy(
        signed_network=_pz_network, nelectrons=1, natoms=1, ndim=3, list_l=2,
        rn_non_local=jnp.asarray(C_RN_NON_LOCAL),
        non_local_coefficient=jnp.asarray(C_NON_LOCAL_COES),
        non_local_exponent=jnp.asarray(C_NON_LOCAL_EXPS), quadrature=quad)
    data = AINetData(positions=jnp.array([0.3, -0.2, 0.4]),
                     spins=jnp.array([1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([4.0]))
    got = float(nl0(None, jax.random.PRNGKey(5), data))
    assert abs(got) < 1e-4, got  # l=0 channel annihilates a pure p state


def test_local_pp_energy_analytic():
    """Single electron at r from a C ccECP atom: compare to the closed form."""
    nelec, natoms = 1, 1
    fn = ecp.local_pp_energy(nelec, natoms, 3, jnp.asarray(C_RN_LOCAL),
                             jnp.asarray(C_LOCAL_COES), jnp.asarray(C_LOCAL_EXPS))
    r = 0.7
    data = AINetData(positions=jnp.array([r, 0.0, 0.0]),
                     spins=jnp.array([1.0]),
                     atoms=jnp.zeros((1, 3)),
                     charges=jnp.array([4.0]))
    got = float(jnp.sum(fn(data)))
    want = (-4.0 / r
            + 4.0 * r ** (1 - 2) * np.exp(-14.43502 * r ** 2)
            + 57.74008 * r ** (3 - 2) * np.exp(-8.39889 * r ** 2)
            - 25.81955 * r ** (2 - 2) * np.exp(-7.38188 * r ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_nonlocal_s_symmetric_wavefunction():
    """For an s-symmetric psi the ratios are angle-independent, so only the l=0
    projector survives and E_nl = v_0(r) exactly (weights sum to 1)."""

    def f(params, pos, spins, atoms, charges):
        del params, spins, charges
        r = jnp.linalg.norm(jnp.reshape(pos, (-1, 3)) - atoms[0], axis=-1)
        return jnp.ones(()), -jnp.sum(r)  # exp(-sum r_i): s-symmetric

    nelec, natoms = 1, 1
    nl = ecp.make_nonlocal_pp_energy(
        signed_network=f, nelectrons=nelec, natoms=natoms, ndim=3, list_l=2,
        rn_non_local=jnp.asarray(C_RN_NON_LOCAL),
        non_local_coefficient=jnp.asarray(C_NON_LOCAL_COES),
        non_local_exponent=jnp.asarray(C_NON_LOCAL_EXPS))
    r = 0.5
    data = AINetData(positions=jnp.array([0.0, 0.0, r]),
                     spins=jnp.array([1.0]),
                     atoms=jnp.zeros((1, 3)),
                     charges=jnp.array([4.0]))
    got = float(nl(None, jax.random.PRNGKey(0), data))
    v0 = 52.13345 * r ** (2 - 2) * np.exp(-7.76079 * r ** 2)
    np.testing.assert_allclose(got, v0, rtol=1e-4)


def test_nonlocal_rotation_invariance_for_s_state():
    """Different random rotations must give identical results for an s state."""

    def f(params, pos, spins, atoms, charges):
        del params, spins, charges
        r = jnp.linalg.norm(jnp.reshape(pos, (-1, 3)) - atoms[0], axis=-1)
        return jnp.ones(()), -jnp.sum(r ** 2)

    nl = ecp.make_nonlocal_pp_energy(
        signed_network=f, nelectrons=2, natoms=1, ndim=3, list_l=2,
        rn_non_local=jnp.asarray(C_RN_NON_LOCAL),
        non_local_coefficient=jnp.asarray(C_NON_LOCAL_COES),
        non_local_exponent=jnp.asarray(C_NON_LOCAL_EXPS))
    data = AINetData(positions=jnp.array([0.1, 0.2, 0.5, -0.4, 0.3, 0.2]),
                     spins=jnp.array([1.0, -1.0]),
                     atoms=jnp.zeros((1, 3)),
                     charges=jnp.array([4.0]))
    e1 = float(nl(None, jax.random.PRNGKey(1), data))
    e2 = float(nl(None, jax.random.PRNGKey(2), data))
    np.testing.assert_allclose(e1, e2, rtol=1e-4)


def _pz_network(params, pos, spins, atoms, charges):
    """Single-electron p_z trial psi = z * exp(-r^2/2): REAL network contract —
    (sign in {-1,+1}, log|psi|). The sign flips when a quadrature rotation
    crosses the z=0 node, exercising the sign-product ratio path that
    s-symmetric oracles (ratio identically 1) never touch."""
    del params, spins, charges
    x = jnp.reshape(pos, (-1, 3)) - atoms[0]
    r2 = jnp.sum(x ** 2)
    z = x[0, 2]
    return jnp.sign(z), jnp.log(jnp.abs(z)) - 0.5 * r2


def test_nonlocal_p_state_s_channel_is_zero():
    """The l=0 projector annihilates a pure p state: E_nl must be EXACTLY 0
    (the 50-pt rule integrates degree-1 polynomials exactly). The historical
    sign-as-angle bug (cos(+-2) = -0.416 instead of -1 on node crossings)
    produced a large spurious positive energy here."""
    nl = ecp.make_nonlocal_pp_energy(
        signed_network=_pz_network, nelectrons=1, natoms=1, ndim=3, list_l=2,
        rn_non_local=jnp.asarray(C_RN_NON_LOCAL),
        non_local_coefficient=jnp.asarray(C_NON_LOCAL_COES),
        non_local_exponent=jnp.asarray(C_NON_LOCAL_EXPS))
    for seed, pos in ((0, [0.3, -0.2, 0.4]), (1, [0.1, 0.5, -0.6])):
        data = AINetData(positions=jnp.array(pos), spins=jnp.array([1.0]),
                         atoms=jnp.zeros((1, 3)), charges=jnp.array([4.0]))
        got = float(nl(None, jax.random.PRNGKey(seed), data))
        r = np.linalg.norm(pos)
        v0 = 52.13345 * np.exp(-7.76079 * r ** 2)  # scale of the bug signal
        assert abs(got) < 1e-5 * max(v0, 1.0), got


def test_nonlocal_p_state_p_channel_identity():
    """V_nl on a pure p state with only an l=1 channel is v_1(r) POINTWISE:
    sum_q w_q 3 P_1(u.w_q) (w_q.z/u.z) = 1 exactly for the octahedral rule."""
    c, b = 3.7, 1.9
    nl = ecp.make_nonlocal_pp_energy(
        signed_network=_pz_network, nelectrons=1, natoms=1, ndim=3, list_l=2,
        rn_non_local=jnp.asarray([[[2.0], [2.0], [2.0]]]),
        non_local_coefficient=jnp.asarray([[[0.0], [c], [0.0]]]),
        non_local_exponent=jnp.asarray([[[1.0], [b], [1.0]]]))
    pos = [0.3, -0.2, 0.4]
    data = AINetData(positions=jnp.array(pos), spins=jnp.array([1.0]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([4.0]))
    got = float(nl(None, jax.random.PRNGKey(3), data))
    r = np.linalg.norm(pos)
    want = c * np.exp(-b * r ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_reference_compat_scaling():
    """reference_compat reproduces the reference's 1/(4 pi) and r^n conventions."""

    def f(params, pos, spins, atoms, charges):
        del params, spins, charges
        r = jnp.linalg.norm(jnp.reshape(pos, (-1, 3)) - atoms[0], axis=-1)
        return jnp.ones(()), -jnp.sum(r)

    kwargs = dict(
        signed_network=f, nelectrons=1, natoms=1, ndim=3, list_l=2,
        rn_non_local=jnp.asarray(C_RN_NON_LOCAL),
        non_local_coefficient=jnp.asarray(C_NON_LOCAL_COES),
        non_local_exponent=jnp.asarray(C_NON_LOCAL_EXPS))
    nl_std = ecp.make_nonlocal_pp_energy(**kwargs)
    nl_ref = ecp.make_nonlocal_pp_energy(reference_compat=True, **kwargs)
    r = 0.5
    data = AINetData(positions=jnp.array([0.0, 0.0, r]),
                     spins=jnp.array([1.0]),
                     atoms=jnp.zeros((1, 3)),
                     charges=jnp.array([4.0]))
    e_std = float(nl_std(None, jax.random.PRNGKey(0), data))
    e_ref = float(nl_ref(None, jax.random.PRNGKey(0), data))
    # reference mode: extra r^2 in v_l and 1/(4 pi) in P_l.
    np.testing.assert_allclose(e_ref, e_std * r ** 2 / (4 * np.pi), rtol=1e-4)


def test_full_pp_local_energy_vs_quadrature():
    """End-to-end ECP Hamiltonian oracle: for the s-product trial
    psi = prod_i exp(-alpha r_i) on the C ccECP atom, <E_L> over |psi|^2 must
    match the exact 1-D quadrature (all four energy channels at once)."""
    import jax
    from aiqmc_tpu.hamiltonian import pp_local_energy
    from aiqmc_tpu.sampling import drift_diffusion

    alpha, nel, batch = 1.2, 4, 512

    def psi(params, pos, spins, atoms, charges):
        r = jnp.linalg.norm(jnp.reshape(pos, (-1, 3)) - atoms[0], axis=-1)
        return jnp.ones(()), -alpha * jnp.sum(r)

    el = pp_local_energy.local_energy(
        f=psi, lognetwork=None, charges=jnp.array([4.0]), nspins=(2, 2),
        rn_local=jnp.asarray(C_RN_LOCAL), local_coes=jnp.asarray(C_LOCAL_COES),
        local_exps=jnp.asarray(C_LOCAL_EXPS),
        rn_non_local=jnp.asarray(C_RN_NON_LOCAL),
        non_local_coes=jnp.asarray(C_NON_LOCAL_COES),
        non_local_exps=jnp.asarray(C_NON_LOCAL_EXPS),
        natoms=1, nelectrons=nel, ndim=3, list_l=2)

    key = jax.random.PRNGKey(0)
    data = AINetData(positions=jax.random.normal(key, (batch, nel * 3)),
                     spins=jnp.array([1., -1., 1., -1.]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([4.0]))
    mc = jax.jit(drift_diffusion.main_monte_carlo(
        psi, tstep=0.3, ndim=3, nelectrons=nel, nsteps=20, batch_size=batch))
    for _ in range(20):
        key, sk = jax.random.split(key)
        data, _ = mc(None, data, sk)
    batch_el = jax.jit(jax.vmap(el, in_axes=(
        None, 0, AINetData(positions=0, spins=None, atoms=None, charges=None))))
    es = []
    for _ in range(10):
        key, sk = jax.random.split(key)
        data, _ = mc(None, data, sk)
        e, _ = batch_el(None, jax.random.split(key, batch), data)
        es.append(np.asarray(e))
    got = np.concatenate(es).mean()

    r = np.linspace(1e-6, 25, 200001)
    rho = r ** 2 * np.exp(-2 * alpha * r)
    rho /= np.trapezoid(rho, r)
    vloc = (-4 / r + 4.0 / r * np.exp(-14.43502 * r ** 2)
            + 57.74008 * r * np.exp(-8.39889 * r ** 2)
            - 25.81955 * np.exp(-7.38188 * r ** 2))
    v0 = 52.13345 * np.exp(-7.76079 * r ** 2)
    want = (4 * (alpha ** 2 / 2) + 4 * np.trapezoid(vloc * rho, r)
            + 4 * np.trapezoid(v0 * rho, r) + 6 * 5 * alpha / 8)
    np.testing.assert_allclose(got, want, atol=0.7)  # MC stderr ~ 0.3
