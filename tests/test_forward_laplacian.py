"""Forward-Laplacian tests: exactness vs the batched-tangent kinetic and on
closed-form functions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiqmc_tpu.hamiltonian import kinetic
from aiqmc_tpu.models import network as nn, spin_indices
from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.ops import forward_laplacian as fl


def test_closed_form_function():
    """f(x) = sum sin(x_i) * exp(x_0): check value/grad/lap analytically."""

    def f(x):
        return jnp.sin(x) * jnp.exp(x[0])

    x = jnp.asarray([0.3, -0.7, 1.1])
    out = fl.forward_laplacian(f)(x)
    np.testing.assert_allclose(np.asarray(out.x),
                               np.sin(x) * np.exp(0.3), rtol=1e-6)
    jac_want = jax.jacfwd(f)(x).T  # (ndirs, out)
    np.testing.assert_allclose(np.asarray(out.jac), np.asarray(jac_want),
                               rtol=1e-5)
    hess = jax.hessian(f)(x)  # (out, n, n)
    lap_want = jnp.trace(hess, axis1=1, axis2=2)
    np.testing.assert_allclose(np.asarray(out.lap), np.asarray(lap_want),
                               rtol=1e-5)


@pytest.mark.parametrize("determinants", [1, 3])
def test_matches_batched_tangent_kinetic(determinants):
    nel = 4
    spins = np.array([1.0, 1.0, -1.0, -1.0])
    atoms = jnp.asarray([[0.0, 0.0, -0.8], [0.0, 0.0, 0.8]])
    charges = jnp.asarray([2.0, 2.0])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nel)
    up, down = spin_indices.spin_indices_h(spins)
    net = nn.make_ai_net(
        nspins=(2, 2), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=2,
        nelectrons=nel, full_equivariance=True, complex_orbitals=False,
        bounded_envelope=True, regular_harmonics=True,
        determinants=determinants,
        hidden_dims=((16, 8), (16, 8)), hidden_dims_Ynlm=(8, 8))
    params = net.init(jax.random.PRNGKey(0))
    ke_ref = kinetic.local_kinetic_energy(net.apply, complex_output=False)
    ke_fwd = fl.make_forward_kinetic(net.orbitals)
    for seed in range(3):
        pos = jax.random.normal(jax.random.PRNGKey(seed), (nel * 3,))
        data = AINetData(positions=pos, spins=jnp.asarray(spins), atoms=atoms,
                         charges=charges)
        want = float(ke_ref(params, data))
        got = float(ke_fwd(params, data))
        np.testing.assert_allclose(got, want, rtol=2e-3)


def test_logpsi_fwdlap_matches_network_log():
    nel = 4
    spins = np.array([1.0, 1.0, -1.0, -1.0])
    atoms = jnp.zeros((1, 3))
    charges = jnp.asarray([4.0])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nel)
    up, down = spin_indices.spin_indices_h(spins)
    net = nn.make_ai_net(
        nspins=(2, 2), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=1,
        nelectrons=nel, full_equivariance=True, complex_orbitals=False,
        determinants=2, hidden_dims=((8, 4), (8, 4)), hidden_dims_Ynlm=(4, 4))
    params = net.init(jax.random.PRNGKey(1))
    pos = jax.random.normal(jax.random.PRNGKey(2), (12,))
    _, log_want = net.apply(params, pos, jnp.asarray(spins), atoms, charges)
    grad_want = jax.grad(
        lambda x: net.apply(params, x, jnp.asarray(spins), atoms, charges)[1]
    )(pos)
    orb = fl.forward_laplacian(
        lambda x: net.orbitals(params, x, jnp.asarray(spins), atoms,
                               charges)[0])(pos)
    _, log_got, grad_got, _ = fl.logpsi_fwdlap(orb)
    np.testing.assert_allclose(float(log_got), float(log_want), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grad_got), np.asarray(grad_want),
                               rtol=1e-3, atol=1e-5)


def test_driver_forward_laplacian_option(tmp_path):
    from aiqmc_tpu.configs import diatomic
    from aiqmc_tpu import train

    cfg = diatomic.h2()
    cfg.batch_size = 8
    cfg.optim.iterations = 2
    cfg.optim.laplacian = "forward"
    cfg.mcmc.steps = 1
    cfg.mcmc.burn_in = 1
    cfg.network.hidden_dims = ((8, 4),)
    cfg.network.hidden_dims_ynlm = (4,)
    cfg.debug.deterministic = True
    cfg.log.save_path = str(tmp_path)
    cfg.log.save_frequency = 1e9
    r = train.train(cfg)
    assert np.isfinite(r.energies).all()


def test_scalar_broadcast_operands():
    """Rank-0 operands in max/min and scalar-pred select_n (regression: the
    psiformer graph clamps with scalar constants; jnp.where with scalar pred
    appears in jax.nn internals)."""

    def f(x):
        y = jnp.maximum(jnp.sum(x ** 2), 0.5)        # scalar FwdLap vs const
        z = jnp.minimum(x, 0.7)                       # array vs rank-0 const
        w = jnp.where(y > 1.0, z * y, z - y)          # scalar pred select
        return w * jax.nn.softmax(x)

    x = jnp.asarray([0.4, -0.2, 0.9])
    out = fl.forward_laplacian(f)(x)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(f(x)), rtol=1e-6)
    jac_want = jax.jacfwd(f)(x).T
    np.testing.assert_allclose(np.asarray(out.jac), np.asarray(jac_want),
                               rtol=1e-5, atol=1e-7)
    hess = jax.hessian(f)(x)
    lap_want = jnp.trace(hess, axis1=1, axis2=2)
    np.testing.assert_allclose(np.asarray(out.lap), np.asarray(lap_want),
                               rtol=1e-5, atol=1e-6)


def test_psiformer_forward_kinetic_matches_batched_tangent():
    """Forward-Laplacian kinetic on the PsiFormer ansatz (attention + layer
    norm + softmax graph) agrees with the batched-tangent kinetic."""
    from aiqmc_tpu.models import psiformer

    nel = 4
    spins = np.array([1.0, 1.0, 1.0, -1.0])
    atoms = jnp.zeros((1, 3))
    charges = jnp.asarray([4.0])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nel)
    up, down = spin_indices.spin_indices_h(spins)
    net = psiformer.make_psiformer(
        nspins=(3, 1), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=1,
        nelectrons=nel, determinants=2, num_layers=2, num_heads=2,
        heads_dim=4, mlp_hidden_dims=(8,))
    params = net.init(jax.random.PRNGKey(3))
    ke_ref = kinetic.local_kinetic_energy(net.apply, complex_output=False)
    ke_fwd = fl.make_forward_kinetic(net.orbitals)
    for seed in range(3):
        pos = jax.random.normal(jax.random.PRNGKey(seed), (nel * 3,))
        data = AINetData(positions=pos, spins=jnp.asarray(spins), atoms=atoms,
                         charges=charges)
        want = float(ke_ref(params, data))
        got = float(ke_fwd(params, data))
        np.testing.assert_allclose(got, want, rtol=2e-3)


# ---------------------------------------------------------------------------
# Primitive-battery fuzz: forward_laplacian vs the jacrev/hessian oracle on
# composite functions covering every rule class (elementwise, linear,
# multiplicative, gather/scatter, reductions, select, dot_general).
# ---------------------------------------------------------------------------

def _oracle(f, x):
    val = f(x)
    jac = jnp.moveaxis(jax.jacrev(f)(x), -1, 0)
    lap = jnp.trace(jax.hessian(f)(x), axis1=-2, axis2=-1)
    return val, jac, lap


def _battery():
    idx = jnp.array([1, 3, 4, 0])

    return {
        "elementwise_chain": lambda x: jnp.log1p(
            jnp.exp(jnp.tanh(x) * jnp.sin(x))) / jnp.sqrt(1.1 + x ** 2),
        "softmax_logsumexp": lambda x: jax.nn.logsumexp(
            3.0 * x) - jnp.sum(jax.nn.softmax(x) * x),
        "dot_chain": lambda x: jnp.dot(
            jnp.outer(x, x), jnp.cos(x)) @ (x / (1.0 + x ** 2)),
        "where_clip": lambda x: jnp.where(
            x > 0.1, jnp.exp(-x), jnp.clip(x, -0.5, 0.5) ** 3),
        "minmax_reduce": lambda x: jnp.max(x ** 2) * jnp.minimum(
            x, 0.7) + jnp.min(jnp.sin(x)),
        # constant update at a nonzero offset: integer index operands must
        # pass through the tangent bind unchanged
        "dyn_update_slice": lambda x: jnp.sum(jax.lax.dynamic_update_slice(
            jnp.tanh(x) * 2.0, jnp.array([5.0]), (2,)) ** 2),
        "scatter_add_const": lambda x: jnp.prod((x * x).at[1].add(3.0)),
        "scatter_set_fl": lambda x: jnp.sum(jnp.zeros(
            6, x.dtype).at[idx].set(jnp.sin(x[:4])) ** 2),
        "scatter_add_fl_on_fl": lambda x: jnp.sum(
            (jnp.cos(x).sum() * jnp.ones(6, x.dtype)
             ).at[idx].add(x[:4] ** 3) ** 2),
        "gather_concat_pad": lambda x: jnp.sum(jnp.concatenate(
            [x[idx], jnp.pad(x, (1, 1), constant_values=2.0)]) ** 3),
        "pow_rsqrt_abs": lambda x: jnp.sum(
            jnp.abs(x) ** 2.5 + jax.lax.rsqrt(2.0 + x ** 2) + x ** 4),
        "logistic_erf": lambda x: jnp.sum(
            jax.nn.sigmoid(x) * jax.lax.erf(x)),
        "split_transpose": lambda x: jnp.sum(jnp.stack(
            jnp.split(jnp.outer(x, x).T @ x, 2)) ** 2),
        "comparisons_sign": lambda x: jnp.sum(
            jnp.sign(x) * x ** 2 * (x > 0.0) + (x <= 0.0) * jnp.cosh(0.0) * x),
        "hyperbolic_inverse": lambda x: jnp.sum(
            jnp.sinh(x) * jnp.cosh(x) + jnp.expm1(-x ** 2)
            + jnp.arctan(x) + jnp.arcsin(x / 2.0) + jnp.arcsinh(x)),
        "clamp_lax": lambda x: jnp.sum(
            jax.lax.clamp(-0.5, jnp.tanh(x) * 2.0, 0.9) ** 2),
        "cumsum_prod": lambda x: jnp.sum(
            jnp.cumsum(x ** 2) * jnp.prod(1.0 + x ** 2)),
        "argmax_gate": lambda x: jnp.sum(
            x ** 3 * (jnp.argmax(x) == jnp.arange(x.shape[0]))),
    }


@pytest.mark.parametrize("name", sorted(_battery()))
def test_primitive_battery_vs_hessian_oracle(name):
    f = _battery()[name]
    x = jnp.array([0.3, -0.8, 1.2, 0.5, -0.25, 0.9])
    v0, j0, l0 = _oracle(f, x)
    out = fl.forward_laplacian(f)(x)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(v0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.jac), np.asarray(j0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.lap), np.asarray(l0),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Complex-pair forward Laplacian (TPU-safe complex representation): the
# orbital network is all-real, only the determinant tail is complex; these
# pin exact agreement with the batched-tangent pair kinetic.
# ---------------------------------------------------------------------------

def _pair_setup(complex_pairs):
    nel = 4
    spins = np.array([1.0, 1.0, -1.0, -1.0])
    atoms = jnp.asarray([[0.0, 0.0, -0.8], [0.0, 0.0, 0.8]])
    charges = jnp.asarray([2.0, 2.0])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nel)
    up, down = spin_indices.spin_indices_h(spins)
    kw = dict(nspins=(2, 2), charges=charges, parallel_indices=par,
              antiparallel_indices=anti, spin_up_indices=up,
              spin_down_indices=down, n_parallel=n_par,
              n_antiparallel=n_anti, ndim=3, natoms=2, nelectrons=nel,
              determinants=3, hidden_dims=((8, 4), (8, 4)),
              hidden_dims_Ynlm=(4, 4), full_equivariance=True,
              bounded_envelope=True, regular_harmonics=True)
    if complex_pairs:
        net = nn.make_ai_net(complex_orbitals=True, complex_pairs=True, **kw)
    else:
        net = nn.make_ai_net(complex_orbitals=False, **kw)
    return net, spins, atoms, charges


def _assert_pair_ke_match(net, params, spins, atoms, charges, ke_ref, ke_fwd,
                          seeds):
    for seed in seeds:
        pos = jax.random.normal(jax.random.PRNGKey(seed), (12,))
        data = AINetData(positions=pos, spins=jnp.asarray(spins), atoms=atoms,
                         charges=charges)
        want = np.asarray(ke_ref(params, data))
        got = np.asarray(ke_fwd(params, data))
        np.testing.assert_allclose(got, want, rtol=3e-3, atol=1e-5)


def test_pair_forward_kinetic_matches_batched_tangent():
    net, spins, atoms, charges = _pair_setup(complex_pairs=True)
    params = net.init(jax.random.PRNGKey(0))
    ke_ref = kinetic.local_kinetic_energy(net.apply, complex_output=True,
                                          pair_output=True)
    ke_fwd = fl.make_forward_kinetic_pair(net.orbitals)
    _assert_pair_ke_match(net, params, spins, atoms, charges, ke_ref, ke_fwd,
                          range(3))


def test_pair_forward_kinetic_twist_boost():
    """The plane-wave boost enters the forward pair kinetic analytically
    (grad_phase += k); must match the batched tangents through the wrapped
    apply."""
    from aiqmc_tpu.pbc import twist as twist_lib

    net, spins, atoms, charges = _pair_setup(complex_pairs=True)
    params = net.init(jax.random.PRNGKey(0))
    lattice = np.eye(3) * 5.0
    tw = (0.25, -0.25, 0.125)
    netT = twist_lib.apply_twist(net, lattice, tw)
    kvec = twist_lib.twist_wavevector(lattice, tw)
    ke_ref = kinetic.local_kinetic_energy(netT.apply, complex_output=True,
                                          pair_output=True)
    ke_fwd = fl.make_forward_kinetic_pair(netT.orbitals, twist_k=kvec)
    _assert_pair_ke_match(net, params, spins, atoms, charges, ke_ref, ke_fwd,
                          range(7, 9))


def test_twisted_real_forward_kinetic():
    """Gamma-real ansatz at a twist (pbc/twist.real_to_angle): the orbitals
    stay real, the boost supplies the whole phase."""
    from aiqmc_tpu.pbc import twist as twist_lib

    net, spins, atoms, charges = _pair_setup(complex_pairs=False)
    params = net.init(jax.random.PRNGKey(1))
    lattice = np.eye(3) * 5.0
    tw = (0.25, -0.25, 0.125)
    netT = twist_lib.apply_twist(twist_lib.real_to_angle(net), lattice, tw)
    kvec = twist_lib.twist_wavevector(lattice, tw)
    ke_ref = kinetic.local_kinetic_energy(netT.apply, complex_output=True,
                                          pair_output=True)
    ke_fwd = fl.make_forward_kinetic_pair(netT.orbitals, twist_k=kvec)
    _assert_pair_ke_match(net, params, spins, atoms, charges, ke_ref, ke_fwd,
                          range(17, 19))


def test_tangent_dot_precision_override(monkeypatch):
    """AIQMC_FWDLAP_TANGENT_PRECISION rebinds ONLY the tangent-propagation
    dots with the requested precision; on CPU (where matmul precision is a
    no-op) every arm must be bit-compatible with the pinned run — this guards
    the eqn-param rebind plumbing, the numerics are the chip probe's job
    (scripts/probe_forward_real.py with the variable set)."""
    def f(x):
        w = jnp.arange(12.0).reshape(3, 4) / 10.0
        return jnp.tanh(x @ w).sum()

    x = jnp.array([0.3, -0.2, 0.7])

    def leaves(r):
        return [np.asarray(r.x), np.asarray(r.jac), np.asarray(r.lap)]

    monkeypatch.delenv("AIQMC_FWDLAP_TANGENT_PRECISION", raising=False)
    base = leaves(fl.forward_laplacian(f)(x))
    for prec in ("default", "highest"):
        monkeypatch.setenv("AIQMC_FWDLAP_TANGENT_PRECISION", prec)
        got = leaves(fl.forward_laplacian(f)(x))
        for a, b in zip(base, got):
            np.testing.assert_allclose(a, b, rtol=1e-6)
