"""Independent oracle: FCI of the 4 valence electrons of C under OUR ccECP
Hamiltonian, in the reference's matched cc-pVDZ valence basis
(ref AIQMC/C.cc-pVDZ.nwchem — the ccECP cc-pVDZ set: 2s 2p 1d).

Purpose: the in-repo ECP validations are self-consistency checks (quadrature
vs our own 1-D integrals; SCF vs VMC of the SCF determinant). This script
pins the ABSOLUTE scale: exact diagonalisation in a real basis must land a
few 10s of mHa above the published ccECP C references (HF -5.316 / exact
-5.434 class numbers) — basis-limited but far below any HF. If VMC plateaus
ABOVE this FCI, the ansatz/optimiser is at fault; if FCI itself disagrees
wildly with the published scale, the Hamiltonian normalisation is at fault.

Runs on CPU in a few minutes. Usage:
  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python -u scripts/fci_ccecp_c.py
"""
import itertools
import time

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from aiqmc_tpu.configs import c_atom_ccecp as cc
from aiqmc_tpu.utils import ecp_scf, gto

# ccECP cc-pVDZ valence basis for C (ref AIQMC/C.cc-pVDZ.nwchem).
CC_PVDZ = [
    ("s", [(13.073594, 0.0051583), (6.541187, 0.0603424),
           (4.573411, -0.1978471), (1.637494, -0.0810340),
           (0.819297, 0.2321726), (0.409924, 0.2914643),
           (0.231300, 0.4336405), (0.102619, 0.2131940),
           (0.051344, 0.0049848)]),
    ("s", [(0.127852, 1.0)]),
    ("p", [(9.934169, 0.0209076), (3.886955, 0.0572698),
           (1.871016, 0.1122682), (0.935757, 0.2130082),
           (0.468003, 0.2835815), (0.239473, 0.3011207),
           (0.117063, 0.2016934), (0.058547, 0.0453575),
           (0.029281, 0.0029775)]),
    ("p", [(0.149161, 1.0)]),
    ("d", [(0.561160, 1.0)]),
]


def build_ccpvdz_basis(center=np.zeros(3)):
    basis = []
    for shell, prims in CC_PVDZ:
        exps = np.array([a for a, _ in prims])
        coefs = np.array([c for _, c in prims])
        for lmn in gto._SHELL_LMN[shell]:
            norms = np.array([gto._prim_norm(a, lmn) for a in exps])
            basis.append(gto.Primitive(center=np.asarray(center, dtype=float),
                                       lmn=lmn, exps=exps, coefs=coefs * norms))
    for b in basis:
        s = 0.0
        for ai, ci in zip(b.exps, b.coefs):
            for aj, cj in zip(b.exps, b.coefs):
                s += ci * cj * gto._overlap_prim(ai, b.lmn, b.center,
                                                 aj, b.lmn, b.center)
        b.coefs = b.coefs / np.sqrt(s)
    return basis


def fci(h1, eri, n_up, n_dn):
    """Dense-sparse FCI over spatial orbitals; chemist (ij|kl) input."""
    n = h1.shape[0]
    ups = list(itertools.combinations(range(n), n_up))
    dns = list(itertools.combinations(range(n), n_dn))
    index = {(u, d): i for i, (u, d) in
             enumerate(itertools.product(ups, dns))}
    dets = list(itertools.product(ups, dns))
    dim = len(dets)

    # Antisymmetrised same-spin two-electron element helpers (physicist):
    # <pq||rs> = (pr|qs) - (ps|qr);   opposite spin: (pr|qs).
    def diag(u, d):
        e = sum(h1[i, i] for i in u) + sum(h1[i, i] for i in d)
        for i, j in itertools.combinations(u, 2):
            e += eri[i, i, j, j] - eri[i, j, j, i]
        for i, j in itertools.combinations(d, 2):
            e += eri[i, i, j, j] - eri[i, j, j, i]
        for i in u:
            for j in d:
                e += eri[i, i, j, j]
        return e

    def single(occ_same, occ_other, h, p, phase):
        """<D| H |D_h^p> within one spin channel."""
        e = h1[h, p]
        for i in occ_same:
            if i == h:
                continue
            e += eri[h, p, i, i] - eri[h, i, i, p]
        for i in occ_other:
            e += eri[h, p, i, i]
        return phase * e

    rows, cols, vals = [], [], []

    def add(a, b, v):
        rows.append(a); cols.append(b); vals.append(v)
        if a != b:
            rows.append(b); cols.append(a); vals.append(v)

    def sphase(occ, h, p):
        """(-1)^(#occupied strictly between h and p)."""
        lo, hi = (h, p) if h < p else (p, h)
        k = sum(1 for i in occ if lo < i < hi)
        return -1.0 if k % 2 else 1.0

    t0 = time.time()
    for a, (u, d) in enumerate(dets):
        add(a, a, diag(u, d))
        uset, dset = set(u), set(d)
        uvirt = [q for q in range(n) if q not in uset]
        dvirt = [q for q in range(n) if q not in dset]
        # up singles
        for h in u:
            for p in uvirt:
                u2 = tuple(sorted(uset - {h} | {p}))
                b = index[(u2, d)]
                if b > a:
                    add(a, b, single(u, d, h, p, sphase(u, h, p)))
        # down singles
        for h in d:
            for p in dvirt:
                d2 = tuple(sorted(dset - {h} | {p}))
                b = index[(u, d2)]
                if b > a:
                    add(a, b, single(d, u, h, p, sphase(d, h, p)))
        # same-spin doubles (up)
        for h1_, h2_ in itertools.combinations(u, 2):
            for p1_, p2_ in itertools.combinations(uvirt, 2):
                u2 = tuple(sorted(uset - {h1_, h2_} | {p1_, p2_}))
                b = index[(u2, d)]
                if b > a:
                    ph = sphase(u, h1_, p1_) * sphase(
                        tuple(sorted(uset - {h1_} | {p1_})), h2_, p2_)
                    v = ph * (eri[h1_, p1_, h2_, p2_] - eri[h1_, p2_, h2_, p1_])
                    add(a, b, v)
        # same-spin doubles (down)
        for h1_, h2_ in itertools.combinations(d, 2):
            for p1_, p2_ in itertools.combinations(dvirt, 2):
                d2 = tuple(sorted(dset - {h1_, h2_} | {p1_, p2_}))
                b = index[(u, d2)]
                if b > a:
                    ph = sphase(d, h1_, p1_) * sphase(
                        tuple(sorted(dset - {h1_} | {p1_})), h2_, p2_)
                    v = ph * (eri[h1_, p1_, h2_, p2_] - eri[h1_, p2_, h2_, p1_])
                    add(a, b, v)
        # opposite-spin doubles
        for h_u in u:
            for p_u in uvirt:
                u2 = tuple(sorted(uset - {h_u} | {p_u}))
                ph_u = sphase(u, h_u, p_u)
                for h_d in d:
                    for p_d in dvirt:
                        d2 = tuple(sorted(dset - {h_d} | {p_d}))
                        b = index[(u2, d2)]
                        if b > a:
                            ph = ph_u * sphase(d, h_d, p_d)
                            add(a, b, ph * eri[h_u, p_u, h_d, p_d])
    H = sp.coo_matrix((vals, (rows, cols)), shape=(dim, dim)).tocsr()
    print("H built: dim %d, nnz %d, %.1fs" % (dim, H.nnz, time.time() - t0))
    w = spla.eigsh(H, k=1, which="SA", return_eigenvectors=False)
    return float(w[0]), dim


def main():
    atoms = np.zeros((1, 3))
    basis = build_ccpvdz_basis()
    nb = len(basis)
    print("basis functions:", nb)
    t0 = time.time()
    S = gto.overlap_matrix(basis)
    hcore = ecp_scf.ecp_core_hamiltonian(
        basis, atoms, np.array([4.0]), cc.RN_LOCAL, cc.LOCAL_COES,
        cc.LOCAL_EXPS, cc.RN_NON_LOCAL, cc.NON_LOCAL_COES, cc.NON_LOCAL_EXPS,
        list_l=2)
    print("1e integrals: %.1fs" % (time.time() - t0))
    t0 = time.time()
    eri = gto.eri_tensor(basis)
    print("ERIs: %.1fs" % (time.time() - t0))
    # Symmetric orthogonalisation (FCI is basis-invariant within the span).
    evals, evecs = np.linalg.eigh(S)
    X = evecs @ np.diag(evals ** -0.5) @ evecs.T
    h1 = X.T @ hcore @ X
    eri_o = np.einsum("pi,qj,pqrs->ijrs", X, X, eri, optimize=True)
    eri_o = np.einsum("rk,sl,ijrs->ijkl", X, X, eri_o, optimize=True)

    e31, dim31 = fci(h1, eri_o, 3, 1)
    print("FCI (3,1) triplet:  E = %.5f Ha  (dim %d)" % (e31, dim31))
    e22, dim22 = fci(h1, eri_o, 2, 2)
    print("FCI (2,2):          E = %.5f Ha  (dim %d)" % (e22, dim22))


if __name__ == "__main__":
    main()
