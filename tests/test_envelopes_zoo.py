"""Envelope zoo tests (pattern: ref ferminet/tests/envelopes_test.py:36-75)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiqmc_tpu.models import envelopes_zoo as zoo
from aiqmc_tpu.models import network as nn, spin_indices

NELEC, NATOMS, NORB = 3, 2, 3


@pytest.mark.parametrize("env_type", [
    zoo.EnvelopeType.ISOTROPIC, zoo.EnvelopeType.BOTTLENECK,
    zoo.EnvelopeType.DIAGONAL,
    zoo.EnvelopeType.FULL, zoo.EnvelopeType.STO, zoo.EnvelopeType.STO_POLY,
])
def test_envelope_shapes_and_decay(env_type):
    init, apply = zoo.get_envelope(env_type)
    params = init(natom=NATOMS, norb=NORB)
    rng = np.random.RandomState(0)
    ae = jnp.asarray(rng.normal(size=(NELEC, NATOMS, 3)))
    r_ae = jnp.linalg.norm(ae, axis=-1, keepdims=True)
    out = apply(r_ae, ae, params)
    assert out.shape == (NELEC, NORB)
    # decay: scaling displacements up must shrink the envelope
    out_far = apply(r_ae * 10.0, ae * 10.0, params)
    assert np.all(np.asarray(out_far) < np.asarray(out))


def test_full_envelope_rotation_covariance_at_identity():
    """At identity covariance the full envelope equals the isotropic one."""
    init_f, apply_f = zoo.get_envelope(zoo.EnvelopeType.FULL)
    init_i, apply_i = zoo.get_envelope(zoo.EnvelopeType.ISOTROPIC)
    pf = init_f(natom=1, norb=2)
    pi = init_i(natom=1, norb=2)
    rng = np.random.RandomState(1)
    ae = jnp.asarray(rng.normal(size=(2, 1, 3)))
    r_ae = jnp.linalg.norm(ae, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(apply_f(r_ae, ae, pf)),
                               np.asarray(apply_i(r_ae, ae, pi)), rtol=1e-4)


def test_gto_envelope_single_s_primitive_is_gaussian():
    """One uncontracted s primitive: env(r) = const * exp(-alpha r^2)."""
    alpha = 0.7
    init, apply = zoo.make_gto_envelope(
        charges=[1.0], basis={"H": [("s", [(alpha, 1.0)])]})
    params = init(natom=1, norb=2)
    r = np.array([0.0, 0.5, 1.3, 2.0])
    ae = jnp.asarray(np.stack([r, np.zeros_like(r), np.zeros_like(r)],
                              axis=-1))[:, None, :]
    r_ae = jnp.linalg.norm(ae, axis=-1, keepdims=True)
    out = np.asarray(apply(r_ae, ae, params))
    assert out.shape == (4, 2)
    np.testing.assert_allclose(out[:, 0] / out[0, 0], np.exp(-alpha * r ** 2),
                               rtol=1e-6)


def test_gto_envelope_ccpvdz_file_and_nuclear_smoothness():
    """cc-pVDZ C channels load from the shipped nwchem file; value and
    gradient are finite at r = 0 (regular solid harmonics, no 1/r rows)."""
    import os
    import aiqmc_tpu
    path = os.path.join(os.path.dirname(aiqmc_tpu.__file__), "data",
                        "C.cc-pVDZ.nwchem")
    init, apply = zoo.make_gto_envelope(charges=[6.0], basis=path)
    params = init(natom=1, norb=3)
    # cc-pVDZ C: 17 s + 3x4 p + 5x1 d primitive channels on the atom.
    assert params["xi"].shape[1] >= 17 + 12 + 5
    # s channels carry the ab-initio contraction init; higher-l start at 0.
    assert float(jnp.abs(params["xi"]).sum()) > 0.0

    def env_sum(flat_ae):
        ae = flat_ae.reshape(1, 1, 3)
        r_ae = jnp.linalg.norm(ae, axis=-1, keepdims=True)
        return jnp.sum(apply(r_ae, ae, params))

    for point in (jnp.zeros(3), jnp.asarray([0.3, -0.2, 0.1])):
        val = env_sum(point)
        grad = jax.grad(env_sum)(point)
        assert np.isfinite(float(val))
        assert np.all(np.isfinite(np.asarray(grad)))


def test_train_envelope_kwargs_gto_branch():
    """cfg.network.envelope_type='gto' plumbs charges + gto_basis through
    train._envelope_kwargs into the zoo builder."""
    from aiqmc_tpu import config as config_lib
    from aiqmc_tpu import train as train_lib
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.zeros((2, 3))
        cfg.system.charges = np.array([6.0, 1.0])
        cfg.system.spins = np.array([1.0, -1.0])
        cfg.network.envelope_type = "gto"
        cfg.network.gto_basis = "even_tempered"
    kwargs = train_lib._envelope_kwargs(cfg, nelectrons=2)
    np.testing.assert_array_equal(kwargs["charges"], [6.0, 1.0])
    assert kwargs["basis"] == "even_tempered"
    init, apply = zoo.get_envelope(zoo.EnvelopeType.GTO, **kwargs)
    params = init(natom=2, norb=4)
    assert params["alpha"].shape[0] == 2


def test_gto_envelope_decays():
    init, apply = zoo.make_gto_envelope(charges=[6.0], basis="even_tempered")
    params = init(natom=1, norb=2)
    rng = np.random.RandomState(3)
    ae = jnp.asarray(rng.normal(size=(NELEC, 1, 3)))
    r_ae = jnp.linalg.norm(ae, axis=-1, keepdims=True)
    near = np.abs(np.asarray(apply(r_ae, ae, params)))
    far = np.abs(np.asarray(apply(r_ae * 10.0, ae * 10.0, params)))
    assert np.all(far < near)


def test_network_with_gto_envelope_antisymmetry():
    """End-to-end through make_ai_net: finite log|psi| and exact
    antisymmetry with the per-orbital GTO envelope."""
    nelec = 4
    spins = np.array([1.0, 1.0, -1.0, -1.0])
    atoms = jnp.zeros((1, 3))
    charges = jnp.asarray([4.0])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nelec)
    up, down = spin_indices.spin_indices_h(spins)
    net = nn.make_ai_net(
        nspins=(2, 2), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=1,
        nelectrons=nelec, full_equivariance=True, complex_orbitals=False,
        determinants=2, envelope_type="gto",
        envelope_kwargs={"charges": [4.0]},
        hidden_dims=((8, 4), (8, 4)), hidden_dims_Ynlm=(4, 4))
    params = net.init(jax.random.PRNGKey(0))
    pos = jax.random.normal(jax.random.PRNGKey(1), (12,))
    phase1, log1 = net.apply(params, pos, jnp.asarray(spins), atoms, charges)
    assert np.isfinite(float(log1))
    x = pos.reshape(4, 3)
    x2 = x.at[jnp.array([0, 1])].set(x[jnp.array([1, 0])]).reshape(-1)
    phase2, log2 = net.apply(params, x2, jnp.asarray(spins), atoms, charges)
    np.testing.assert_allclose(float(log2), float(log1), rtol=1e-5)
    np.testing.assert_allclose(float(phase2), -float(phase1), atol=1e-6)


@pytest.mark.parametrize("env_type", ["isotropic", "bottleneck", "sto_poly", "null"])
def test_network_with_zoo_envelope(env_type):
    nelec = 4
    spins = np.array([1.0, 1.0, -1.0, -1.0])
    atoms = jnp.zeros((1, 3))
    charges = jnp.asarray([4.0])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nelec)
    up, down = spin_indices.spin_indices_h(spins)
    net = nn.make_ai_net(
        nspins=(2, 2), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=1,
        nelectrons=nelec, full_equivariance=True, complex_orbitals=False,
        determinants=2, envelope_type=env_type,
        hidden_dims=((8, 4), (8, 4)), hidden_dims_Ynlm=(4, 4))
    params = net.init(jax.random.PRNGKey(0))
    pos = jax.random.normal(jax.random.PRNGKey(1), (12,))
    _, log1 = net.apply(params, pos, jnp.asarray(spins), atoms, charges)
    assert np.isfinite(float(log1))
    # antisymmetry preserved with per-orbital envelopes
    x = pos.reshape(4, 3)
    x2 = x.at[jnp.array([0, 1])].set(x[jnp.array([1, 0])]).reshape(-1)
    phase1, _ = net.apply(params, pos, jnp.asarray(spins), atoms, charges)
    phase2, log2 = net.apply(params, x2, jnp.asarray(spins), atoms, charges)
    np.testing.assert_allclose(float(log2), float(log1), rtol=1e-5)
    np.testing.assert_allclose(float(phase2), -float(phase1), atol=1e-6)
