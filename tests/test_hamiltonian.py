"""Hamiltonian tests (pattern: ref ferminet/tests/hamiltonian_test.py:62-254)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiqmc_tpu.hamiltonian import coulomb, kinetic, local_energy
from aiqmc_tpu.models import network as nn, spin_indices
from aiqmc_tpu.models.network import AINetData


def _hydrogen_net(alpha=1.0):
    """Exact hydrogen ground state psi = exp(-alpha r) as a (phase, log) net."""

    def f(params, pos, spins, atoms, charges):
        del params, spins, charges
        r = jnp.linalg.norm(pos - atoms[0])
        return jnp.zeros(()), -alpha * r

    return f


def test_hydrogen_local_energy_exact():
    """E_L of exp(-r) is exactly -0.5 Ha everywhere (cusp-cancelling)."""
    f = _hydrogen_net(alpha=1.0)
    atoms = jnp.zeros((1, 3))
    charges = jnp.ones((1,))
    e_l = local_energy.local_energy(f, charges, (1, 0), complex_output=False)
    key = jax.random.PRNGKey(0)
    for seed in range(5):
        pos = jax.random.normal(jax.random.PRNGKey(seed), (3,))
        data = AINetData(positions=pos, spins=jnp.array([1.0]), atoms=atoms,
                         charges=charges)
        e, _ = e_l(None, key, data)
        np.testing.assert_allclose(float(e), -0.5, rtol=1e-5)


def test_hydrogen_excited_2p():
    """psi_2p = z exp(-r/2): E_L = -1/8 Ha exactly."""

    def f(params, pos, spins, atoms, charges):
        del params, spins, charges
        rvec = pos - atoms[0]
        r = jnp.linalg.norm(rvec)
        psi = rvec[2] * jnp.exp(-r / 2)
        return jnp.sign(psi), jnp.log(jnp.abs(psi))

    atoms = jnp.zeros((1, 3))
    charges = jnp.ones((1,))
    e_l = local_energy.local_energy(f, charges, (1, 0), complex_output=False)
    pos = jnp.array([0.3, -0.2, 0.7])
    data = AINetData(positions=pos, spins=jnp.array([1.0]), atoms=atoms,
                     charges=charges)
    e, _ = e_l(None, jax.random.PRNGKey(0), data)
    np.testing.assert_allclose(float(e), -0.125, rtol=1e-5)


@pytest.mark.parametrize("laplacian_chunk", [None, 2])
def test_kinetic_vs_brute_force_hessian(laplacian_chunk):
    """Batched-tangent Laplacian equals the dense-Hessian trace on a real net."""
    nel, natoms = 4, 1
    spins = np.array([1.0, 1.0, -1.0, -1.0])
    atoms = jnp.zeros((natoms, 3))
    charges = jnp.asarray([4.0])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nel)
    up, down = spin_indices.spin_indices_h(spins)
    net = nn.make_ai_net(
        nspins=(2, 2), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=natoms,
        nelectrons=nel, full_equivariance=True, complex_orbitals=False)
    key = jax.random.PRNGKey(1)
    params = net.init(key)
    pos = jax.random.normal(key, (12,))
    data = AINetData(positions=pos, spins=jnp.asarray(spins), atoms=atoms,
                     charges=charges)

    ke = kinetic.local_kinetic_energy(net.apply, complex_output=False,
                                      laplacian_chunk=laplacian_chunk)
    got = ke(params, data)

    logabs = lambda x: net.apply(params, x, data.spins, atoms, charges)[1]
    hess = jax.jacfwd(jax.grad(logabs))(pos)
    grad = jax.grad(logabs)(pos)
    want = -0.5 * (jnp.trace(hess) + jnp.sum(grad ** 2))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


def test_kinetic_complex_matches_brute_force():
    """Complex kinetic energy: phase-gradient terms (ref hamiltonian.py:111-130)."""
    nel, natoms = 2, 1
    spins = np.array([1.0, -1.0])
    atoms = jnp.zeros((natoms, 3))
    charges = jnp.asarray([2.0])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nel)
    up, down = spin_indices.spin_indices_h(spins)
    net = nn.make_ai_net(
        nspins=(1, 1), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=natoms,
        nelectrons=nel, full_equivariance=True, complex_orbitals=True)
    key = jax.random.PRNGKey(2)
    params = net.init(key)
    pos = jax.random.normal(key, (6,))
    data = AINetData(positions=pos, spins=jnp.asarray(spins), atoms=atoms,
                     charges=charges)
    ke = kinetic.local_kinetic_energy(net.apply, complex_output=True)
    got = complex(ke(params, data))

    # Brute force: psi = exp(log|psi| + i phase); -1/2 del^2 psi / psi.
    def logpsi(x):
        phase, mag = net.apply(params, x, data.spins, atoms, charges)
        return mag + 1.0j * phase

    grad_re = jax.grad(lambda x: logpsi(x).real)(pos)
    grad_im = jax.grad(lambda x: logpsi(x).imag)(pos)
    hess_re = jax.jacfwd(jax.grad(lambda x: logpsi(x).real))(pos)
    hess_im = jax.jacfwd(jax.grad(lambda x: logpsi(x).imag))(pos)
    grad_c = grad_re + 1.0j * grad_im
    lap_c = jnp.trace(hess_re) + 1.0j * jnp.trace(hess_im)
    want = complex(-0.5 * (lap_c + jnp.sum(grad_c ** 2)))
    np.testing.assert_allclose(got.real, want.real, rtol=1e-4)
    np.testing.assert_allclose(got.imag, want.imag, rtol=1e-4, atol=1e-6)


def test_potential_terms_closed_form():
    """He2+-style closed forms (pattern: ref tests/hamiltonian_test.py:85-155)."""
    atoms = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 2.0]])
    charges = jnp.array([2.0, 2.0])
    # one electron exactly between the nuclei
    pos = jnp.array([0.0, 0.0, 1.0])
    ae = pos.reshape(1, 1, 3) - atoms[None]
    r_ae = jnp.linalg.norm(ae, axis=-1, keepdims=True)
    v_en = coulomb.potential_electron_nuclear(charges, r_ae)
    np.testing.assert_allclose(float(v_en), -4.0, rtol=1e-6)
    v_nn = coulomb.potential_nuclear_nuclear(charges, atoms)
    np.testing.assert_allclose(float(v_nn), 2.0, rtol=1e-6)


def test_potential_electron_electron():
    pos = jnp.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0], [0.0, 4.0, 0.0]])
    ee = pos[None] - pos[:, None]
    r_ee = jnp.linalg.norm(ee + jnp.eye(3)[..., None], axis=-1) * (1 - jnp.eye(3))
    v_ee = coulomb.potential_electron_electron(r_ee[..., None])
    want = 1 / 3 + 1 / 4 + 1 / 5
    np.testing.assert_allclose(float(v_ee), want, rtol=1e-6)
