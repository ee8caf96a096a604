"""T-moves for nonlocal pseudopotentials (Casula size-consistent scheme).

Capability parity with ref ``AIQMCrelease3/DMC/Tmoves.py:32-225``: heat-bath
selection among the nonlocal-ECP transition amplitudes
t_{i,a,q} = (exp(-tau v_l) - 1) P_l(cos theta) psi(x')/psi(x) over the 50-point
rotated quadrature, per electron.

TPU redesign: the amplitudes reuse the same single batched psi-ratio evaluation
as the nonlocal energy (one network call over nelec x natoms x 50 configs); the
per-electron heat-bath CDF + selection is vectorised ``searchsorted`` (the
reference applies ``jnp.apply_along_axis`` per row and hardcodes grid-size slices
1:19/19:55/... at Tmoves.py:206-210).

Scheme notes: this implements Casula's original T-move algorithm (select among
{no move, positive-amplitude moves} with probability t/norm, always accept),
with per-electron normalisation. The reference normalises by a single scalar
summed over ALL electrons (Tmoves.py:113-115) and adds a forward/backward
acceptance on top; per-electron heat-bath selection needs no extra acceptance.
"""

from __future__ import annotations

from typing import Tuple

import chex
import jax
import jax.numpy as jnp

from aiqmc_tpu.hamiltonian import ecp
from aiqmc_tpu.models import blocks
from aiqmc_tpu.models.network import AINetData


def compute_tmoves(list_l: int,
                   tstep: float,
                   nelectrons: int,
                   natoms: int,
                   ndim: int,
                   signed_network,
                   Rn_non_local: jnp.ndarray,
                   Non_local_coes: jnp.ndarray,
                   Non_local_exps: jnp.ndarray,
                   reference_compat: bool = False,
                   complex_output: bool = False,
                   quadrature: str = "msc50",
                   lattice=None):
    """Returns tmove(data, params, key) -> (new positions (3N,), move mask).

    lattice: periodic systems — the projector acts about each atom's NEAREST
    image (minimum-image displacements, quadrature sphere centred on that
    image), matching hamiltonian/ecp.make_nonlocal_pp_energy. With an
    angle-output network (complex/pair/twisted) the amplitudes use the REAL
    part of the psi ratio, which is the fixed-phase effective-Hamiltonian
    matrix element."""
    get_v_l = ecp.get_non_v_l(ndim, nelectrons, natoms, Rn_non_local,
                              Non_local_coes, Non_local_exps,
                              reference_compat=reference_compat,
                              lattice=lattice)
    base_points, base_weights = ecp.get_quadrature(quadrature)
    base_points = jnp.asarray(base_points)
    base_weights = jnp.asarray(base_weights)
    nq = base_points.shape[0]

    def tmove(data: AINetData, params, key: chex.PRNGKey
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pos = data.positions
        x = jnp.reshape(pos, (nelectrons, ndim))
        ae = ecp.min_image(x[:, None, :] - data.atoms[None, :, :], lattice)
        r_ae = jnp.linalg.norm(ae, axis=-1)
        u = ae / r_ae[..., None]
        # Quadrature sphere centre: the atom (molecular) or its nearest image
        # to each electron (periodic), exactly as make_nonlocal_pp_energy.
        centres = (x[:, None, :] - ae if lattice is not None
                   else jnp.broadcast_to(data.atoms[None, :, :],
                                         (nelectrons, natoms, ndim)))

        key, rot_key, select_key = jax.random.split(key, num=3)
        rot = jax.random.orthogonal(rot_key, n=ndim)
        pts = base_points @ rot
        cos_theta = jnp.einsum("iad,qd->iaq", u, pts)
        new_e = (centres[:, :, None, :] +
                 r_ae[..., None, None] * pts[None, None])  # (nelec,natoms,nq,3)

        base = jnp.broadcast_to(pos, (nelectrons, natoms, nq, nelectrons * ndim))
        eye = jnp.eye(nelectrons, dtype=pos.dtype)
        mask = jnp.repeat(eye, ndim, axis=1)
        repl = jnp.tile(new_e, (1, 1, 1, nelectrons))
        configs = (base * (1.0 - mask[:, None, None, :])
                   + repl * mask[:, None, None, :])

        def logpsi_parts(x_flat):
            phase, mag = signed_network(params, x_flat, data.spins, data.atoms,
                                        data.charges)
            return mag, phase

        mag0, phase0 = logpsi_parts(pos)
        flat = jnp.reshape(configs, (nelectrons * natoms * nq, -1))
        mags, phases = jax.vmap(logpsi_parts)(flat)
        dmag = jnp.reshape(mags - mag0, (nelectrons, natoms, nq))
        ratio_re, _ = blocks.psi_ratio_real_imag(
            dmag, jnp.reshape(phases, (nelectrons, natoms, nq)), phase0,
            complex_output)

        p_l = ecp.legendre_stack(cos_theta, list_l,
                                 include_4pi=reference_compat)
        v_l = get_v_l(data)  # (nelec, natoms, n_l)
        n_l = v_l.shape[-1]
        p_l = p_l[:n_l]
        # (exp(-tau v_l) - 1) P_l ratio, summed over l (ref Tmoves.py:54-95).
        wfac = jnp.exp(-tstep * v_l) - 1.0  # (nelec, natoms, n_l)
        t_amp = jnp.einsum("ial,liaq->iaq", wfac, p_l) * ratio_re
        t_amp = jnp.maximum(t_amp, 0.0) * base_weights[None, None, :]

        # Per-electron heat-bath over {stay} + natoms*nq moves, factorised as
        # (Bernoulli move decision) x (categorical target). A single CDF over
        # [1, t_1, t_2, ...] is numerically treacherous in f32: with
        # sum(t) << 1 every cumulative entry sits within machine epsilon of
        # 1.0, the per-target increments vanish in the rounding, and a uniform
        # draw that lands past the "stay" entry picks an essentially uniform
        # target — including zero-amplitude ones across the node (observed as
        # a catastrophic energy bias on the TPU backend, where the cumsum
        # rounds differently than on CPU). The factorised form keeps both
        # stages well-conditioned: p_move = sum(t)/(1+sum(t)) is exact in f32
        # relative terms, and the target categorical works on log-amplitudes.
        flat_amp = t_amp.reshape(nelectrons, natoms * nq)
        sum_t = jnp.sum(flat_amp, axis=-1)
        p_move = sum_t / (1.0 + sum_t)
        move_key, target_key = jax.random.split(select_key)
        moved = jax.random.uniform(move_key, (nelectrons,)) < p_move
        logits = jnp.where(flat_amp > 0.0,
                           jnp.log(jnp.maximum(flat_amp, 1e-38)), -jnp.inf)
        # Guard all-zero rows (categorical over all -inf) with a flat dummy.
        any_pos = sum_t > 0.0
        safe_logits = jnp.where(any_pos[:, None], logits,
                                jnp.zeros_like(logits))
        move_idx = jax.random.categorical(target_key, safe_logits, axis=-1)
        moved = moved & any_pos
        candidates = new_e.reshape(nelectrons, natoms * nq, ndim)
        chosen = candidates[jnp.arange(nelectrons), move_idx]
        x_new = jnp.where(moved[:, None], chosen, x)
        return x_new.reshape(-1), moved

    return tmove
