"""ccECP pseudopotentials: local channel + nonlocal angular-momentum projection.

Capability parity with ref ``AIQMCrelease3/pseudopotential/pseudopotential.py`` and
``pp_energy_test.py`` (a production module despite the name, imported by
``Energy/pphamiltonian.py:26``): Gaussian-expansion local/nonlocal radial channels
and the randomly-rotated 50-point Mitas-Shirley-Ceperley octahedral quadrature for
the nonlocal projection.

TPU redesign:
  * The four grid classes (OA/OB/OC/OD) are fused into a single (50, 3) point set
    with per-point weights, rotated by one random orthogonal matrix, and ALL
    (nelectron x natom x 50) single-electron displacements are evaluated through
    the wavefunction in ONE batched call (ref pseudopotential.py:272-318 +
    pp_energy_test.py:70-103 perform 4 separate triple-vmapped passes).
  * Complex psi-ratios are carried as (real, imag) pairs so the path runs on TPU
    backends without complex64 support.

Physics corrections vs the reference (both opt-out via ``reference_compat``):
  * quadrature displacements are centred on the parent *atom*
    (x' = R_a + r_ia * Omega), not on the coordinate origin
    (ref pseudopotential.py:288-291 sets x' = r_ia * Omega, only valid for an
    atom at the origin);
  * the standard nonlocal integral  sum_l (2l+1) v_l(r) <P_l psi'/psi>_Omega is
    used: the reference folds an extra 1/(4 pi) into P_l
    (pseudopotential.py:250-269) while its quadrature weights already sum to 1,
    and evaluates the nonlocal radial function with r^n instead of the ccECP
    convention r^(n-2) (pseudopotential.py:150 vs :101 for the local channel).
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import chex
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Quadrature grids (ref pseudopotential.py:181-225).
# ---------------------------------------------------------------------------

def generate_quadrature_grids() -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                         np.ndarray, np.ndarray]:
    """Octahedral 50-point grids OA(6)/OB(12)/OC(8)/OD(24) + class weights."""
    octpts = np.mgrid[-1:2, -1:2, -1:2].reshape(3, -1).T
    nonzero_count = np.count_nonzero(octpts, axis=1)
    OA = octpts[nonzero_count == 1].astype(np.float64)
    OB = octpts[nonzero_count == 2] / np.sqrt(2.0)
    OC = octpts[nonzero_count == 3] / np.sqrt(3.0)
    d1 = OC * np.sqrt(3.0 / 11.0)
    OD1 = np.stack([d1[:, 0], d1[:, 1], d1[:, 2] * 3], axis=1)
    OD2 = np.stack([d1[:, 0], d1[:, 1] * 3, d1[:, 2]], axis=1)
    OD3 = np.stack([d1[:, 0] * 3, d1[:, 1], d1[:, 2]], axis=1)
    OD = np.concatenate([OD1, OD2, OD3], axis=0)
    OD = OD / np.linalg.norm(OD, axis=1, keepdims=True)
    weights = np.array([[4 / 315], [64 / 2835], [27 / 1280], [14641 / 725760]])
    return OA, OB, OC, OD, weights


@functools.lru_cache()
def fused_quadrature() -> Tuple[np.ndarray, np.ndarray]:
    """Single (50, 3) unit-vector grid with per-point weights summing to 1."""
    OA, OB, OC, OD, weights = generate_quadrature_grids()
    points = np.concatenate([OA, OB, OC, OD], axis=0)
    w = np.concatenate([
        np.full(len(OA), weights[0, 0]),
        np.full(len(OB), weights[1, 0]),
        np.full(len(OC), weights[2, 0]),
        np.full(len(OD), weights[3, 0]),
    ])
    return points, w


@functools.lru_cache()
def icosahedral_quadrature() -> Tuple[np.ndarray, np.ndarray]:
    """12-point icosahedral rule (spherical 5-design): exact for all spherical
    harmonics of degree <= 5, i.e. for every ccECP projector l <= 3 against
    band-limited integrands, at 1/4 the cost of the 50-point rule.

    Parity with the upstream FermiNet ECP path, which integrates the nonlocal
    projector on a randomly aligned 12-point icosahedral grid
    (ref ferminet/pseudopotential.py:100-168); the random per-step rotation
    makes the residual high-harmonic error average to zero over the run.
    """
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    verts = []
    for a in (-1.0, 1.0):
        for b in (-phi, phi):
            verts.append((0.0, a, b))
            verts.append((a, b, 0.0))
            verts.append((b, 0.0, a))
    pts = np.asarray(verts) / np.sqrt(1.0 + phi * phi)
    w = np.full(len(pts), 1.0 / len(pts))
    return pts, w


def get_quadrature(name: str = "msc50") -> Tuple[np.ndarray, np.ndarray]:
    """Named angular rules for the nonlocal projection: 'msc50' (the
    reference's Mitas-Shirley-Ceperley octahedral 50-point rule) or
    'icosahedral12' (upstream FermiNet's 12-point spherical 5-design)."""
    if name == "msc50":
        return fused_quadrature()
    if name == "icosahedral12":
        return icosahedral_quadrature()
    raise ValueError(f"Unknown ECP quadrature: {name!r}")


def get_rot(batch_size: int, key: chex.PRNGKey):
    """Randomly rotated per-class grids, reference API (ref ps.py:233-241)."""
    key, subkey = jax.random.split(key)
    rot = jax.random.orthogonal(key=key, n=3, shape=(batch_size,))
    OA, OB, OC, OD, weights = generate_quadrature_grids()
    pts = [jnp.einsum("jkl,ik->jil", rot, jnp.asarray(P)) for P in (OA, OB, OC, OD)]
    return (*pts, jnp.asarray(weights))


# ---------------------------------------------------------------------------
# Radial channels (ref pseudopotential.py:86-165).
# ---------------------------------------------------------------------------

def min_image(ae: jnp.ndarray, lattice) -> jnp.ndarray:
    """Minimum-image displacement(s) under a periodic lattice (rows =
    primitive vectors); identity when lattice is None."""
    if lattice is None:
        return ae
    from aiqmc_tpu.pbc.enforce import minimum_image
    return minimum_image(lattice, ae)


def local_pp_energy(nelectrons: int,
                    natoms: int,
                    ndim: int,
                    rn_local: jnp.ndarray,
                    local_coefficient: jnp.ndarray,
                    local_exponent: jnp.ndarray,
                    lattice=None,
                    coulomb: bool = True) -> Callable:
    """V_loc(r) = -Z_eff/r + sum_k c_k r^(n_k - 2) exp(-e_k r^2)
    (ref pseudopotential.py:86-117). Returns fn(data) -> (nelec, natoms).

    lattice: evaluate at the minimum-image displacement (periodic systems).
    coulomb=False drops the -Z_eff/r term — used under PBC where the periodic
    Coulomb part lives in the Ewald sum and only the short-ranged Gaussian
    correction V_loc + Z_eff/r remains here (it decays within ~1 bohr for
    ccECPs, so one nearest image suffices)."""
    rn = jnp.asarray(rn_local) - 2  # (natoms, K)
    coes = jnp.asarray(local_coefficient)
    exps = jnp.asarray(local_exponent)

    def pp_local_part_energy(data) -> jnp.ndarray:
        ae = jnp.reshape(data.positions, [-1, 1, ndim]) - data.atoms[None, ...]
        ae = min_image(ae, lattice)
        r_ae = jnp.linalg.norm(ae, axis=-1)  # (nelec, natoms)
        r = r_ae[..., None]  # (nelec, natoms, 1)
        part2 = jnp.sum(coes * r ** rn * jnp.exp(-exps * jnp.square(r)), axis=-1)
        if not coulomb:
            return part2
        part1 = -1 * data.charges / r_ae
        return part1 + part2

    return pp_local_part_energy


def get_non_v_l(ndim: int,
                nelectrons: int,
                natoms: int,
                rn_non_local: jnp.ndarray,
                non_local_coefficient: jnp.ndarray,
                non_local_exponent: jnp.ndarray,
                reference_compat: bool = False,
                lattice=None) -> Callable:
    """Nonlocal radial functions v_l(r) (ref pseudopotential.py:134-165).

    Returns fn(data) -> (nelec, natoms, n_l). In standard mode the ccECP radial
    convention v_l = sum_k c_k r^(n_k - 2) exp(-e_k r^2) is used; reference_compat
    reproduces the reference's r^(n_k).
    """
    shift = 0 if reference_compat else 2
    rn = jnp.asarray(rn_non_local) - shift  # (natoms, n_l, K)
    coes = jnp.asarray(non_local_coefficient)
    exps = jnp.asarray(non_local_exponent)

    def get_non_local_coe(data) -> jnp.ndarray:
        ae = jnp.reshape(data.positions, [-1, 1, ndim]) - data.atoms[None, ...]
        ae = min_image(ae, lattice)
        r_ae = jnp.linalg.norm(ae, axis=-1)  # (nelec, natoms)
        r = r_ae[:, :, None, None]  # (nelec, natoms, 1, 1)
        val = coes[None] * r ** rn[None] * jnp.exp(-exps[None] * jnp.square(r))
        return jnp.sum(val, axis=-1)  # (nelec, natoms, n_l)

    return get_non_local_coe


def legendre_stack(x: jnp.ndarray, list_l: int,
                   include_4pi: bool = False) -> jnp.ndarray:
    """Stacked (2l+1) P_l(x) for l = 0..list_l (ref pseudopotential.py:250-269).

    include_4pi divides by 4 pi (the reference's normalisation)."""
    rows = [jnp.ones_like(x)]
    if list_l >= 1:
        rows.append(3.0 * x)
    if list_l >= 2:
        rows.append(5.0 * 0.5 * (3.0 * x * x - 1.0))
    if list_l >= 3:
        rows.append(7.0 * 0.5 * (5.0 * x ** 3 - 3.0 * x))
    out = jnp.stack(rows, axis=0)
    if include_4pi:
        out = out / (4.0 * jnp.pi)
    return out


# ---------------------------------------------------------------------------
# Fused nonlocal energy (replaces ref get_P_l + pp_energy_test assembly).
# ---------------------------------------------------------------------------

def make_nonlocal_pp_energy(signed_network,
                            nelectrons: int,
                            natoms: int,
                            ndim: int,
                            list_l: int,
                            rn_non_local: jnp.ndarray,
                            non_local_coefficient: jnp.ndarray,
                            non_local_exponent: jnp.ndarray,
                            complex_output: bool = False,
                            reference_compat: bool = False,
                            pair_output: bool = False,
                            quadrature: str = "msc50",
                            lattice=None) -> Callable:
    """Nonlocal ECP energy for one walker: one batched psi-ratio evaluation.

    E_nl = sum_{i,a,l} (2l+1) v_l(r_ia) sum_q w_q P_l(cos theta_q) psi(x')/psi(x)
    over all (electron i, atom a, quadrature point q) single-electron
    displacements x' = x with x_i -> R_a + r_ia * Omega_q.

    ``signed_network`` returns (phase, log|psi|); psi-ratios are assembled from
    the two real parts as (re, im) pairs (TPU-safe, no complex64 needed).
    ``quadrature``: 'msc50' (reference parity) or 'icosahedral12' (upstream
    FermiNet parity, ~4x cheaper — the dominant pp-system cost).
    """
    get_v_l = get_non_v_l(ndim, nelectrons, natoms, rn_non_local,
                          non_local_coefficient, non_local_exponent,
                          reference_compat=reference_compat, lattice=lattice)
    base_points, base_weights = get_quadrature(quadrature)
    base_points = jnp.asarray(base_points)
    base_weights = jnp.asarray(base_weights)
    nq = base_points.shape[0]

    def nonlocal_energy(params, key: chex.PRNGKey, data) -> jnp.ndarray:
        pos = data.positions
        x = jnp.reshape(pos, (nelectrons, ndim))
        ae = x[:, None, :] - data.atoms[None, :, :]  # (nelec, natoms, 3)
        ae = min_image(ae, lattice)
        # Under PBC the projector acts about each atom's NEAREST image: the
        # effective atom centre for electron i is x_i - ae_mi.
        atom_centres = (x[:, None, :] - ae if lattice is not None
                        else jnp.broadcast_to(data.atoms[None, :, :],
                                              ae.shape))
        r_ae = jnp.linalg.norm(ae, axis=-1)  # (nelec, natoms)
        u = ae / r_ae[..., None]

        rot = jax.random.orthogonal(key, n=ndim)
        pts = base_points @ rot  # (nq, 3), still unit vectors

        # cos(theta) between original and displaced directions (pts are unit).
        cos_theta = jnp.einsum("iad,qd->iaq", u, pts)

        if reference_compat:
            # Reference places the displaced electron at r_ia * Omega from the
            # coordinate origin (ref pseudopotential.py:288-313).
            new_e = r_ae[..., None, None] * pts[None, None]  # (nelec,natoms,nq,3)
        else:
            new_e = (atom_centres[:, :, None, :] +
                     r_ae[..., None, None] * pts[None, None])

        # Build all displaced configurations: (nelec, natoms, nq, 3N).
        base = jnp.broadcast_to(pos, (nelectrons, natoms, nq, nelectrons * ndim))
        eye = jnp.eye(nelectrons, dtype=pos.dtype)
        # mask[i] selects electron i's coordinate block.
        mask = jnp.repeat(eye, ndim, axis=1)  # (nelec, 3N)
        new_flat = jnp.reshape(new_e, (nelectrons, natoms, nq, ndim))
        # Scatter electron i's new coords into the flat configuration: zero out
        # its block in the base and add the tiled replacement under the mask.
        repl = jnp.tile(new_flat, (1, 1, 1, nelectrons))  # (nelec,natoms,nq,3N)
        configs = (base * (1.0 - mask[:, None, None, :])
                   + repl * mask[:, None, None, :])

        def logpsi_parts(x_flat):
            phase, mag = signed_network(params, x_flat, data.spins, data.atoms,
                                        data.charges)
            return mag, phase

        mag0, phase0 = logpsi_parts(pos)
        flat_configs = jnp.reshape(configs, (nelectrons * natoms * nq, -1))
        mags, phases = jax.vmap(logpsi_parts)(flat_configs)
        dmag = jnp.reshape(mags - mag0, (nelectrons, natoms, nq))
        from aiqmc_tpu.models import blocks
        ratio_re, ratio_im = blocks.psi_ratio_real_imag(
            dmag, jnp.reshape(phases, (nelectrons, natoms, nq)), phase0,
            complex_output)

        p_l = legendre_stack(cos_theta, list_l,
                             include_4pi=reference_compat)  # (L+1,nelec,natoms,nq)
        v_l = get_v_l(data)  # (nelec, natoms, n_l)
        n_l = v_l.shape[-1]
        p_l = p_l[:n_l]
        proj_re = jnp.einsum("q,liaq,iaq->ial", base_weights, p_l, ratio_re)
        e_re = jnp.sum(v_l * proj_re)
        if complex_output:
            proj_im = jnp.einsum("q,liaq,iaq->ial", base_weights, p_l, ratio_im)
            e_im = jnp.sum(v_l * proj_im)
            if pair_output:
                return jnp.stack([e_re, e_im])
            return e_re + 1.0j * e_im
        return e_re

    return nonlocal_energy


def get_P_l(nelectrons: int, natoms: int, ndim: int, log_network_inner):
    """Reference-API shim (ref pseudopotential.py:272-318).

    Returns generate_points_information(data, params, Points, weights) ->
    (cos_theta, ratios, roted_configurations, weights, roted_coords) for one
    rotated grid class, matching the reference's calling convention
    (``log_network_inner`` returns the complex log psi). The fused
    make_nonlocal_pp_energy path is preferred on TPU; this shim exists for
    parity with code written against the reference.
    """

    def generate_points_information(data, params, points, weights):
        pos = data.positions
        x = jnp.reshape(pos, (nelectrons, ndim))
        ae = x[:, None, :] - data.atoms[None, :, :]
        r_ae = jnp.linalg.norm(ae, axis=-1)
        u = ae / r_ae[..., None]
        pts = points[0] if points.ndim == 3 else points  # (nq, 3)
        nq = pts.shape[0]
        cos_theta = jnp.einsum("iad,qd->iaq", u, pts)[None]
        new_e = (data.atoms[None, :, None, :]
                 + r_ae[..., None, None] * pts[None, None])
        base = jnp.broadcast_to(pos, (nelectrons, natoms, nq,
                                      nelectrons * ndim))
        eye = jnp.eye(nelectrons, dtype=pos.dtype)
        mask = jnp.repeat(eye, ndim, axis=1)
        repl = jnp.tile(new_e, (1, 1, 1, nelectrons))
        configs = (base * (1.0 - mask[:, None, None, :])
                   + repl * mask[:, None, None, :])
        denominator = log_network_inner(params, pos, data.spins, data.atoms,
                                        data.charges)
        flat = jnp.reshape(configs, (nelectrons * natoms * nq, -1))
        values = jax.vmap(
            lambda c: log_network_inner(params, c, data.spins, data.atoms,
                                        data.charges))(flat)
        ratios = jnp.exp(jnp.reshape(values, (nelectrons, natoms, nq))
                         - denominator) * weights
        return (cos_theta, ratios[None], configs[None], weights,
                new_e[None])

    return generate_points_information
