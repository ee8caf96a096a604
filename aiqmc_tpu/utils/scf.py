"""Restricted Hartree-Fock on the embedded STO-3G basis (pure NumPy).

Capability parity with ref ``ferminet/utils/scf.py`` (pyscf-backed ``Scf``
wrapper used for pretraining targets and orbital evaluation,
ref ferminet/pretrain.py:34-61). pyscf is absent in this environment; this
self-contained RHF (symmetric orthogonalisation + damped Roothaan iterations)
reproduces published STO-3G energies (H2 @1.4 bohr: -1.1167 Ha;
He: -2.8077 Ha) and exposes differentiable occupied-orbital evaluation
for pretraining (utils/gto.eval_basis).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.utils import gto


@dataclasses.dataclass
class RhfResult:
    energy: float              # total energy incl. nuclear repulsion
    mo_coeff: np.ndarray       # (nbasis, nbasis), columns = MOs
    mo_energy: np.ndarray      # (nbasis,)
    nocc: int
    basis: list                # gto.Primitive list
    converged: bool


def nuclear_repulsion(atoms: np.ndarray, charges: np.ndarray) -> float:
    atoms = np.asarray(atoms, dtype=float)
    e = 0.0
    for i in range(len(atoms)):
        for j in range(i):
            e += charges[i] * charges[j] / np.linalg.norm(atoms[i] - atoms[j])
    return float(e)


def run_rhf(atoms, charges, nelectrons: Optional[int] = None,
            max_iter: int = 100, tol: float = 1e-8,
            damping: float = 0.3, basis=None) -> RhfResult:
    """Closed-shell RHF. nelectrons defaults to sum(charges) and must be even.

    basis: any spec accepted by gto.build_basis (None = embedded STO-3G with
    even-tempered fallback; "sto-3g"; "even_tempered"; nwchem file path;
    parsed dict) — the arbitrary-basis capability of the reference's
    pyscf-backed SCF (ref ferminet/utils/scf.py:53-301).
    """
    atoms = np.asarray(atoms, dtype=float)
    charges = np.asarray(charges, dtype=float)
    if nelectrons is None:
        nelectrons = int(round(charges.sum()))
    if nelectrons % 2 != 0:
        raise ValueError("RHF requires an even electron count; use spin-free "
                         "pretraining targets for open shells")
    nocc = nelectrons // 2

    basis = gto.build_basis(atoms, charges, basis=basis)
    S = gto.overlap_matrix(basis)
    T = gto.kinetic_matrix(basis)
    V = gto.nuclear_matrix(basis, atoms, charges)
    eri = gto.eri_tensor(basis)
    hcore = T + V

    e_elec, mo_coeff, mo_energy, converged = roothaan(
        S, hcore, eri, nocc, max_iter=max_iter, tol=tol, damping=damping)
    energy = e_elec + nuclear_repulsion(atoms, charges)
    return RhfResult(energy=float(energy), mo_coeff=mo_coeff,
                     mo_energy=mo_energy, nocc=nocc, basis=basis,
                     converged=converged)


def roothaan(S, hcore, eri, nocc: int, max_iter: int = 100, tol: float = 1e-8,
             damping: float = 0.3):
    """Closed-shell Roothaan SCF on prebuilt integrals.

    Returns (e_elec, mo_coeff, mo_energy, converged). Factored out so the
    valence-only ECP SCF (utils/ecp_scf.py) can reuse it with an ECP-dressed
    hcore."""
    # Symmetric orthogonalisation.
    w, U = np.linalg.eigh(S)
    X = U @ np.diag(w ** -0.5) @ U.T

    def fock(D):
        J = np.einsum("ijkl,kl->ij", eri, D)
        K = np.einsum("ikjl,kl->ij", eri, D)
        return hcore + J - 0.5 * K

    D = np.zeros_like(S)
    e_old = 0.0
    e_elec = 0.0
    converged = False
    mo_coeff = None
    mo_energy = None
    for it in range(max_iter):
        F = fock(D)
        Fp = X.T @ F @ X
        mo_energy, Cp = np.linalg.eigh(Fp)
        mo_coeff = X @ Cp
        Cocc = mo_coeff[:, :nocc]
        D_new = 2.0 * Cocc @ Cocc.T
        if it > 0:
            D_new = (1 - damping) * D_new + damping * D
        D = D_new
        e_elec = 0.5 * np.sum(D * (hcore + fock(D)))
        if abs(e_elec - e_old) < tol and it > 1:
            converged = True
            break
        e_old = e_elec
    return e_elec, mo_coeff, mo_energy, converged


def make_rhf_orbitals(result: RhfResult, nspins: Tuple[int, int]):
    """Pretraining target: occupied RHF MOs per spin channel.

    Returns targets(pos) -> (phi_up (n_up, n_up), phi_down (n_dn, n_dn)),
    the signature consumed by aiqmc_tpu.pretrain.make_pretrain_step. For
    open-shell counts the lowest n_up / n_dn doubly-occupied-style MOs are
    used.
    """
    mo = jnp.asarray(result.mo_coeff)
    basis = result.basis

    def targets(pos: jnp.ndarray):
        x = jnp.reshape(pos, (-1, 3))
        nup = nspins[0]
        xu, xd = x[:nup], x[nup:]
        ao_u = gto.eval_basis(basis, xu)          # (n_up, nbasis)
        ao_d = gto.eval_basis(basis, xd)
        phi_u = ao_u @ mo[:, :nup]
        phi_d = ao_d @ mo[:, :nspins[1]] if nspins[1] > 0 else jnp.zeros((0, 0))
        return phi_u, phi_d

    return targets


@dataclasses.dataclass
class UhfResult:
    """Unrestricted HF solution (per-spin MO coefficients)."""
    energy: float
    mo_coeff: Tuple[np.ndarray, np.ndarray]   # (alpha, beta), each (nb, nb)
    mo_energy: Tuple[np.ndarray, np.ndarray]
    nocc: Tuple[int, int]
    basis: object
    converged: bool


def run_uhf(atoms, charges, nspins: Tuple[int, int],
            max_iter: int = 200, tol: float = 1e-8,
            damping: float = 0.3, basis=None) -> UhfResult:
    """Open-shell UHF (Pople-Nesbet) on the native integrals.

    The reference gets UHF from pyscf for open-shell pretraining targets
    (ref ferminet/utils/scf.py:53-301 `restricted=False`); this is the native
    equivalent over the same basis specs as run_rhf. A tiny symmetry-breaking
    perturbation on the beta guess avoids the RHF saddle point.
    """
    atoms = np.asarray(atoms, dtype=float)
    charges = np.asarray(charges, dtype=float)
    n_up, n_dn = int(nspins[0]), int(nspins[1])

    basis = gto.build_basis(atoms, charges, basis=basis)
    S = gto.overlap_matrix(basis)
    T = gto.kinetic_matrix(basis)
    V = gto.nuclear_matrix(basis, atoms, charges)
    eri = gto.eri_tensor(basis)
    hcore = T + V

    w, U = np.linalg.eigh(S)
    X = U @ np.diag(w ** -0.5) @ U.T

    def solve(F):
        Fp = X.T @ F @ X
        eps, Cp = np.linalg.eigh(Fp)
        return eps, X @ Cp

    def density(C, nocc):
        Cocc = C[:, :nocc]
        return Cocc @ Cocc.T

    # Core guess; perturb the beta channel to break alpha/beta symmetry.
    eps_a, Ca = solve(hcore)
    eps_b, Cb = solve(hcore + 1e-3 * np.diag(np.arange(len(S))))
    Da, Db = density(Ca, n_up), density(Cb, n_dn)

    e_old, converged = 0.0, False
    e_elec = 0.0
    for it in range(max_iter):
        J = np.einsum("ijkl,kl->ij", eri, Da + Db)
        Ka = np.einsum("ikjl,kl->ij", eri, Da)
        Kb = np.einsum("ikjl,kl->ij", eri, Db)
        Fa, Fb = hcore + J - Ka, hcore + J - Kb
        eps_a, Ca = solve(Fa)
        eps_b, Cb = solve(Fb)
        Da_new, Db_new = density(Ca, n_up), density(Cb, n_dn)
        if it > 0:
            Da_new = (1 - damping) * Da_new + damping * Da
            Db_new = (1 - damping) * Db_new + damping * Db
        Da, Db = Da_new, Db_new
        e_elec = 0.5 * (np.sum((Da + Db) * hcore)
                        + np.sum(Da * Fa) + np.sum(Db * Fb))
        if abs(e_elec - e_old) < tol and it > 1:
            converged = True
            break
        e_old = e_elec
    energy = e_elec + nuclear_repulsion(atoms, charges)
    return UhfResult(energy=float(energy), mo_coeff=(Ca, Cb),
                     mo_energy=(eps_a, eps_b), nocc=(n_up, n_dn),
                     basis=basis, converged=converged)


def make_uhf_orbitals(result: UhfResult, nspins: Tuple[int, int]):
    """Pretraining target from UHF: each spin channel uses ITS OWN occupied
    orbitals (correct open-shell targets, unlike the doubled-RHF fallback)."""
    mo_a = jnp.asarray(result.mo_coeff[0])
    mo_b = jnp.asarray(result.mo_coeff[1])
    basis = result.basis

    def targets(pos: jnp.ndarray):
        x = jnp.reshape(pos, (-1, 3))
        nup = nspins[0]
        xu, xd = x[:nup], x[nup:]
        phi_u = gto.eval_basis(basis, xu) @ mo_a[:, :nup]
        phi_d = (gto.eval_basis(basis, xd) @ mo_b[:, :nspins[1]]
                 if nspins[1] > 0 else jnp.zeros((0, 0)))
        return phi_u, phi_d

    return targets


# ---------------------------------------------------------------------------
# Mean-field excitations (NES-VMC pretraining targets)
# ---------------------------------------------------------------------------

def lowest_excitations(mo_energy, nocc: Tuple[int, int], n: int,
                       norb: Optional[Tuple[int, int]] = None):
    """The n lowest-Koopmans single/double S_z-preserving excitations.

    Host-side NumPy (static, computed once at build time). Each excitation is
    returned as per-spin OCCUPIED-ORBITAL COLUMN INDICES — the representation
    the orbital-target evaluator consumes directly — instead of the upstream's
    swap lists (ref ferminet/utils/scf.py:302-373 get_excitations, whose
    consumer rebuilds exactly these index sets at eval time).

    Args:
      mo_energy: (eps_up, eps_dn) per-spin MO energies (pass the same array
        twice for RHF).
      nocc: (n_up, n_dn) occupied counts.
      n: number of EXCITED determinants wanted (the ground occupation is not
        included in the result).
      norb: optional per-spin orbital counts (default: len(mo_energy[s])).

    Returns:
      list of n (delta_e, occ_up (n_up,), occ_dn (n_dn,)) tuples, sorted by
      the Koopmans energy difference delta_e.
    """
    eps = [np.asarray(mo_energy[0]), np.asarray(mo_energy[1])]
    if norb is None:
        norb = (len(eps[0]), len(eps[1]))

    # Same-channel swaps preserve S_z; cross-channel singles do not.
    def channel_swaps(s):
        return [(float(eps[s][a] - eps[s][i]), i, a)
                for i in range(nocc[s]) for a in range(nocc[s], norb[s])]

    singles = []
    for s in range(2):
        for de, i, a in channel_swaps(s):
            singles.append((de, ((s, i, a),)))

    doubles = []
    swaps = [channel_swaps(0), channel_swaps(1)]
    for s1 in range(2):
        for k1, (de1, i1, a1) in enumerate(swaps[s1]):
            for s2 in range(s1, 2):
                start = k1 + 1 if s2 == s1 else 0
                for de2, i2, a2 in swaps[s2][start:]:
                    if s1 == s2 and (i1 == i2 or a1 == a2):
                        continue  # Pauli: distinct holes and particles
                    doubles.append((de1 + de2, ((s1, i1, a1), (s2, i2, a2))))

    ranked = sorted(singles + doubles, key=lambda t: t[0])
    if len(ranked) < n:
        raise ValueError(
            f"want {n} excitations, basis supports {len(ranked)} — "
            "use a larger basis set")

    out = []
    for de, swaps_k in ranked[:n]:
        occ = [list(range(nocc[0])), list(range(nocc[1]))]
        for s, i, a in swaps_k:
            occ[s][i] = a
        out.append((de, np.asarray(occ[0], dtype=int),
                    np.asarray(occ[1], dtype=int)))
    return out


def make_occ_orbitals(basis, mo_a, mo_b, nspins: Tuple[int, int],
                      occ_up, occ_dn):
    """targets(pos) -> (phi_up, phi_dn) from EXPLICIT MO column indices."""
    mo_a = jnp.asarray(mo_a)
    mo_b = jnp.asarray(mo_b)
    occ_up = np.asarray(occ_up, dtype=int)
    occ_dn = np.asarray(occ_dn, dtype=int)

    def targets(pos: jnp.ndarray):
        x = jnp.reshape(pos, (-1, 3))
        nup = nspins[0]
        xu, xd = x[:nup], x[nup:]
        phi_u = gto.eval_basis(basis, xu) @ mo_a[:, occ_up]
        phi_d = (gto.eval_basis(basis, xd) @ mo_b[:, occ_dn]
                 if nspins[1] > 0 else jnp.zeros((0, 0)))
        return phi_u, phi_d

    return targets


def make_excited_target_list(result, nspins: Tuple[int, int], states: int):
    """K pretraining-target fns: ground + the (states-1) lowest excitations.

    result: RhfResult or UhfResult. State 0 targets the mean-field ground
    determinant; state k>0 targets the k-th lowest S_z-preserving
    single/double excitation (ref ferminet/pretrain.py:160-196 +
    utils/scf.py:302: the upstream pretrains each NES-VMC state against its
    own excited Slater determinant)."""
    if isinstance(result, UhfResult):
        mo_a, mo_b = result.mo_coeff
        eps = result.mo_energy
    else:
        mo_a = mo_b = result.mo_coeff
        eps = (result.mo_energy, result.mo_energy)
    ground = (np.arange(nspins[0]), np.arange(nspins[1]))
    occs = [ground]
    if states > 1:
        for _, occ_up, occ_dn in lowest_excitations(eps, nspins, states - 1):
            occs.append((occ_up, occ_dn))
    return [make_occ_orbitals(result.basis, mo_a, mo_b, nspins, u, d)
            for u, d in occs]
