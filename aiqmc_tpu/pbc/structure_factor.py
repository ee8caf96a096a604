"""Static structure factor S(k) and finite-size corrections.

Beyond the reference (whose PBC energies carry the full small-cell two-body
finite-size error; BASELINE.md diamond rows): measure

    S(k) = ( <rho_k rho_{-k}> - |<rho_k>|^2 ) / N,    rho_k = sum_e e^{i k.r_e}

over the walker batch on a shell-grouped reciprocal grid, and apply the
leading-order two-body (potential) finite-size correction of Chiesa, Ceperley,
Martin & Holzmann, PRL 97, 076404 (2006): the Ewald sum omits the k -> 0
contribution of the exchange-correlation hole; with S(k) -> a k^2 as k -> 0,
the omitted term is

    dV = lim_{k->0} (1/(2*Omega)) * v(k) * S(k) = 2*pi*a / Omega   (Hartree/cell)

for the 3D Coulomb v(k) = 4 pi / k^2. The coefficient a is fitted from the
smallest measured shells; the FIT QUALITY (whether S ~ k^2 actually holds at
the measured k) is reported so an under-converged cell cannot silently claim a
literature-grade correction.

TPU notes: rho_k is evaluated as cos/sin pairs (no complex dtype on this
backend); one (batch, nelec) x (nelec, nk) contraction per estimate — MXU work,
not a gather chain.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def reciprocal_vectors(lattice: np.ndarray) -> np.ndarray:
    """Reciprocal lattice matrix with ROWS b_j, a_i . b_j = 2 pi delta_ij
    (lattice rows are primitive vectors, repo convention)."""
    lattice = np.asarray(lattice, dtype=float)
    return 2.0 * np.pi * np.linalg.inv(lattice).T


def make_kshells(lattice: np.ndarray, nmax: int = 4,
                 kcut: float = None) -> Tuple[np.ndarray, np.ndarray]:
    """Nonzero reciprocal vectors k = n . B (integer n in [-nmax, nmax]^3),
    de-duplicated under k -> -k (S is even), sorted by |k|.

    Returns (kpoints (nk, 3), knorm (nk,)). kcut trims to |k| <= kcut.
    """
    B = reciprocal_vectors(lattice)
    rng = np.arange(-nmax, nmax + 1)
    n = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), axis=-1)
    n = n.reshape(-1, 3)
    n = n[np.any(n != 0, axis=1)]
    # Keep one of each +-k pair: first nonzero component positive.
    keep = []
    for v in n:
        nz = v[np.nonzero(v)[0][0]]
        if nz > 0:
            keep.append(v)
    k = np.asarray(keep) @ B
    norm = np.linalg.norm(k, axis=1)
    order = np.argsort(norm)
    k, norm = k[order], norm[order]
    if kcut is not None:
        mask = norm <= kcut
        k, norm = k[mask], norm[mask]
    return k, norm


def make_structure_factor(kpoints: np.ndarray, nelectrons: int):
    """estimator(data) -> (nk,) batch-estimate of S(k).

    data.positions: (batch, nelec*ndim). The batch average inside IS the
    Monte-Carlo expectation under GSPMD (sharded batches reduce globally).
    """
    kpts = jnp.asarray(np.asarray(kpoints).T)  # (3, nk)

    def estimator(data) -> jnp.ndarray:
        x = jnp.reshape(data.positions, (data.positions.shape[0], -1, 3))
        phase = x @ kpts                       # (batch, nelec, nk)
        c = jnp.sum(jnp.cos(phase), axis=1)    # Re rho_k  (batch, nk)
        s = jnp.sum(jnp.sin(phase), axis=1)    # Im rho_k
        rho2 = jnp.mean(c ** 2 + s ** 2, axis=0)
        mean_c = jnp.mean(c, axis=0)
        mean_s = jnp.mean(s, axis=0)
        return (rho2 - mean_c ** 2 - mean_s ** 2) / nelectrons

    return estimator


def shell_average(knorm: np.ndarray, sk: np.ndarray, decimals: int = 8
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Group S(k) values into |k| shells (returns (k_shell, S_shell))."""
    knorm = np.asarray(knorm)
    sk = np.asarray(sk)
    ks = np.round(knorm, decimals)
    shells = np.unique(ks)
    out = np.array([sk[ks == v].mean() for v in shells])
    return shells, out


def chiesa_potential_correction(knorm: np.ndarray, sk: np.ndarray,
                                volume: float, nshells: int = 2):
    """Leading-order two-body finite-size correction (CCMH 2006).

    Fits S(k) = a k^2 through the nshells smallest |k| shells (least squares
    through the origin) and returns

      {"dv": 2 pi a / volume,            # Hartree per simulation cell
       "a": a,
       "fit_rel_residual": r}            # max relative deviation of the fit

    A large residual (>> 0.1) means the measured shells are outside the
    k^2 regime — the correction is then a lower bound at best and should not
    be quoted as converged.
    """
    shells, s_shell = shell_average(knorm, sk)
    if len(shells) < nshells:
        raise ValueError(f"need {nshells} shells, have {len(shells)}")
    k2 = shells[:nshells] ** 2
    s_fit = s_shell[:nshells]
    a = float(np.sum(k2 * s_fit) / np.sum(k2 * k2))
    resid = np.abs(a * k2 - s_fit) / np.maximum(np.abs(s_fit), 1e-12)
    return {"dv": 2.0 * np.pi * a / float(volume), "a": a,
            "fit_rel_residual": float(resid.max())}
