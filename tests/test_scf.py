"""GTO integrals + RHF tests against published STO-3G values
(pattern: ref ferminet/utils/tests/{gto,scf}_test.py, with literature values
replacing the pyscf oracle)."""

import numpy as np
import pytest

from aiqmc_tpu.utils import gto, scf


def test_h2_sto3g_energy():
    r = scf.run_rhf(np.array([[0.0, 0.0, -0.7], [0.0, 0.0, 0.7]]),
                    np.array([1.0, 1.0]))
    assert r.converged
    np.testing.assert_allclose(r.energy, -1.11671, atol=2e-4)


def test_he_sto3g_energy():
    r = scf.run_rhf(np.array([[0.0, 0.0, 0.0]]), np.array([2.0]))
    np.testing.assert_allclose(r.energy, -2.80778, atol=2e-4)


def test_h2o_sto3g_energy():
    ang = np.deg2rad(104.52 / 2)
    atoms = np.array([
        [0.0, 0.0, 0.0],
        [1.809 * np.sin(ang), 0.0, 1.809 * np.cos(ang)],
        [-1.809 * np.sin(ang), 0.0, 1.809 * np.cos(ang)],
    ])
    r = scf.run_rhf(atoms, np.array([8.0, 1.0, 1.0]))
    np.testing.assert_allclose(r.energy, -74.963, atol=2e-3)


def test_overlap_normalised():
    basis = gto.build_basis(np.zeros((1, 3)), np.array([6.0]))
    S = gto.overlap_matrix(basis)
    np.testing.assert_allclose(np.diag(S), 1.0, atol=1e-10)


def test_mo_orthonormality():
    r = scf.run_rhf(np.array([[0.0, 0.0, -0.7], [0.0, 0.0, 0.7]]),
                    np.array([1.0, 1.0]))
    basis = r.basis
    S = gto.overlap_matrix(basis)
    ctsc = r.mo_coeff.T @ S @ r.mo_coeff
    np.testing.assert_allclose(ctsc, np.eye(len(basis)), atol=1e-8)


def test_eval_basis_matches_quadrature_norm():
    """Numerically integrate |phi|^2 of the C 1s function on a grid ~ 1."""
    import jax.numpy as jnp
    basis = gto.build_basis(np.zeros((1, 3)), np.array([6.0]))
    grid = np.linspace(-3, 3, 61)
    pts = np.stack(np.meshgrid(grid, grid, grid, indexing="ij"), -1).reshape(-1, 3)
    vals = np.asarray(gto.eval_basis(basis, jnp.asarray(pts)))[:, 0]
    dv = (grid[1] - grid[0]) ** 3
    np.testing.assert_allclose(np.sum(vals ** 2) * dv, 1.0, rtol=2e-2)


def test_rhf_pretraining_targets():
    from aiqmc_tpu import pretrain
    import jax.numpy as jnp
    targets = pretrain.make_rhf_targets(
        np.array([[0.0, 0.0, -0.7], [0.0, 0.0, 0.7]]), np.array([1.0, 1.0]),
        (1, 1))
    phi_u, phi_d = targets(jnp.asarray([0.1, 0.2, 0.3, -0.1, -0.2, -0.3]))
    assert phi_u.shape == (1, 1)
    assert phi_d.shape == (1, 1)
    assert np.isfinite(np.asarray(phi_u)).all()
