"""Valence-only RHF with a semilocal ccECP folded into the core Hamiltonian.

Pretraining targets for pseudopotential systems: the reference pretrains
against pyscf HF with the ECP attached to the molecule
(ref ferminet/pretrain.py:34-61, base_config.py `use_pp`); pyscf is absent
here, so this module assembles the pseudo-Hamiltonian natively:

    hcore = T + sum_A [ -Z_eff^A/r_A  +  V_loc-Gauss^A  +  V_nl^A ]

on a valence STO-3G basis (the element's STO-3G shells minus its He core),
then reuses the Roothaan solver in ``utils.scf``. Radial conventions match
``hamiltonian/ecp.py`` exactly (v = sum_k c_k r^(n_k-2) exp(-a_k r^2); the
semilocal projector sum_l v_l(r) sum_m |Y_lm><Y_lm|), so the SCF energy is the
expectation of the SAME Hamiltonian the QMC samples — which the tests verify
by Monte-Carlo integrating <Phi_HF| H_ECP |Phi_HF> with the oracle-tested
local energy (tests/test_ecp_scf.py).

Integrals of the Gaussian ECP terms use a per-atom radial Gauss-Legendre x
octahedral-50-point angular grid (exact for the smooth Gaussian-polynomial
integrands at this resolution; validated against the analytic single-centre
moments in the tests). The nonlocal projector uses the Legendre addition
theorem sum_m Y_lm(u) Y_lm(u') = (2l+1)/(4pi) P_l(u.u') over the same grid,
reusing ``hamiltonian.ecp.legendre_stack``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from aiqmc_tpu.utils import gto, scf


def build_valence_basis(atoms: np.ndarray, z_true: Sequence[int],
                        z_eff: Sequence[float]):
    """STO-3G shells of the true element minus the ECP core shells.

    Supports He-core ECPs (ncore = 2: drop the 1s shell), covering ccECPs of
    Li..Ne. Returns a gto.Primitive list.
    """
    basis = []
    for center, zt, ze in zip(np.asarray(atoms, dtype=float), z_true, z_eff):
        ncore = int(round(zt - ze))
        if ncore not in (0, 2):
            raise ValueError(f"Only He-core ECPs supported (ncore={ncore})")
        full = gto.build_basis(np.asarray([center]), np.asarray([zt]))
        if ncore == 2:
            # The first function in the embedded STO-3G tables is the core 1s.
            full = full[1:]
        basis.extend(full)
    return basis


def _radial_angular_grid(center: np.ndarray, n_radial: int = 80,
                         r_max: float = 12.0):
    """Per-atom quadrature: Gauss-Legendre radii x 50-pt octahedral sphere.

    Returns (points (nr*50, 3), weights (nr*50,), radii (nr,), unit vectors).
    Weights include r^2 dr and the 4*pi dOmega measure.
    """
    from aiqmc_tpu.hamiltonian.ecp import fused_quadrature
    x, wr = np.polynomial.legendre.leggauss(n_radial)
    r = 0.5 * r_max * (x + 1.0)
    wr = 0.5 * r_max * wr
    units, wa = fused_quadrature()            # (50, 3), weights sum to 1
    pts = center[None, None] + r[:, None, None] * units[None]
    w = (wr * r ** 2)[:, None] * (4.0 * np.pi * wa)[None]
    return pts.reshape(-1, 3), w.reshape(-1), r, np.asarray(units), \
        np.asarray(wa), wr


def _eval_basis_np(basis, pts: np.ndarray) -> np.ndarray:
    import jax
    from aiqmc_tpu.utils.gto import eval_basis
    return np.asarray(eval_basis(basis, pts))


def _radial_v(r: np.ndarray, rn, coes, exps) -> np.ndarray:
    """sum_k c_k r^(n_k - 2) exp(-a_k r^2) on radii r (matches ecp.py)."""
    rn = np.asarray(rn, dtype=float) - 2.0
    out = np.zeros_like(r)
    for n, c, a in zip(rn, np.asarray(coes, float), np.asarray(exps, float)):
        out = out + c * r ** n * np.exp(-a * r * r)
    return out


def ecp_core_hamiltonian(basis, atoms, z_eff,
                         rn_local, local_coes, local_exps,
                         rn_non_local, non_local_coes, non_local_exps,
                         list_l: int = 2, n_radial: int = 80,
                         r_max: float = 12.0) -> np.ndarray:
    """hcore = T - Z_eff/r + Gaussian-local + nonlocal-projector integrals."""
    from aiqmc_tpu.hamiltonian.ecp import legendre_stack
    import jax.numpy as jnp

    atoms = np.asarray(atoms, dtype=float)
    T = gto.kinetic_matrix(basis)
    V = gto.nuclear_matrix(basis, atoms, np.asarray(z_eff, dtype=float))
    hcore = T + V

    for a_idx, center in enumerate(atoms):
        pts, w, r, units, wa, wr = _radial_angular_grid(center, n_radial,
                                                        r_max)
        chi = _eval_basis_np(basis, pts)               # (npts, nb)
        # Local Gaussian terms: one diagonal quadrature.
        v_loc = _radial_v(np.linalg.norm(pts - center[None], axis=-1),
                          rn_local[a_idx], local_coes[a_idx],
                          local_exps[a_idx])
        hcore = hcore + chi.T @ (w[:, None] * v_loc[:, None] * chi)

        # Nonlocal: (2l+1)/(4pi) * int r^2 dr v_l(r) *
        #           [int dOmega chi_i P_l] [int dOmega' chi_j P_l] via the
        # addition theorem on the 50-pt grid.
        nr = len(r)
        chi_r = chi.reshape(nr, len(units), -1)        # (nr, 50, nb)
        cosang = units @ units.T                       # (50, 50)
        p_l = np.asarray(legendre_stack(jnp.asarray(cosang), list_l))
        n_l = np.asarray(rn_non_local[a_idx]).shape[0]
        for l in range(min(n_l, p_l.shape[0])):
            v_l = _radial_v(r, rn_non_local[a_idx][l],
                            non_local_coes[a_idx][l],
                            non_local_exps[a_idx][l])
            if not np.any(v_l):
                continue
            # Addition theorem: sum_m A_ilm(r) A_jlm(r) =
            #   (2l+1)/(4pi) int dO dO' P_l(u.u') chi_i chi_j
            # = 4pi * sum_qp wa_q wa_p [(2l+1) P_l](u_q.u_p) chi_i chi_j
            # (legendre_stack already carries the (2l+1) factor; the two 4pi
            # quadrature factors cancel one 1/(4pi)).
            K = (wa[:, None] * wa[None, :]) * p_l[l]   # (50, 50)
            M = np.einsum("rqi,qp,rpj->rij", chi_r, K, chi_r)
            radial_w = wr * r ** 2 * v_l * (4.0 * np.pi)
            hcore = hcore + np.einsum("r,rij->ij", radial_w, M)
    return hcore


def run_rhf_ecp(atoms, z_true, z_eff,
                rn_local, local_coes, local_exps,
                rn_non_local, non_local_coes, non_local_exps,
                nelectrons: Optional[int] = None, list_l: int = 2,
                max_iter: int = 200, tol: float = 1e-8,
                damping: float = 0.3) -> scf.RhfResult:
    """Closed-shell valence RHF under the semilocal ECP."""
    atoms = np.asarray(atoms, dtype=float)
    z_eff = np.asarray(z_eff, dtype=float)
    if nelectrons is None:
        nelectrons = int(round(z_eff.sum()))
    if nelectrons % 2 != 0:
        raise ValueError("RHF needs an even valence electron count")
    nocc = nelectrons // 2

    basis = build_valence_basis(atoms, z_true, z_eff)
    S = gto.overlap_matrix(basis)
    eri = gto.eri_tensor(basis)
    hcore = ecp_core_hamiltonian(
        basis, atoms, z_eff, rn_local, local_coes, local_exps,
        rn_non_local, non_local_coes, non_local_exps, list_l=list_l)

    e_elec, mo_coeff, mo_energy, converged = scf.roothaan(
        S, hcore, eri, nocc, max_iter=max_iter, tol=tol, damping=damping)
    energy = e_elec + scf.nuclear_repulsion(atoms, z_eff)
    return scf.RhfResult(energy=float(energy), mo_coeff=mo_coeff,
                         mo_energy=mo_energy, nocc=nocc, basis=basis,
                         converged=converged)
