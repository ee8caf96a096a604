"""Batched small-matrix slogdet / inverse tuned for TPU.

The determinant tail of the wavefunction evaluates (batch * ndet) tiny
(nelec, nelec) determinants per forward pass (ref
wavefunction_Ynlm/network_blocks.py:138-158 uses jnp.linalg.slogdet). XLA
lowers ``jnp.linalg.slogdet``/``inv`` to a sequential LU with dynamic-slice
pivot loops — a poor fit for the TPU VPU when the matrices are this small and
the batch is this large. Here instead:

  * ``_ge_slogdet`` / ``_gj_inv``: Gaussian elimination / Gauss-Jordan with
    partial pivoting, **unrolled over the (static, small) matrix dimension and
    fully vectorised over the batch**. Every step is elementwise/reduction work
    across the walker batch — no per-matrix control flow, no dynamic slices.
    Pivot "row swaps" are one-hot selects, so the whole factorisation is a
    fixed dataflow graph XLA fuses aggressively.

  * Closed-form ``jax.custom_jvp`` rules make both primitives smoothly
    differentiable to ANY order (the rules reference only the primitive
    outputs: d log|det A| = tr(A^-1 dA), d A^-1 = -A^-1 dA A^-1), which the
    QMC stack needs: reverse-mode for the sampler drift and energy gradient,
    forward-over-reverse for the kinetic Laplacian, and JVPs for KFAC's exact
    quadratic model.

Semantics match ``jnp.linalg.slogdet`` for real input, including sign=0,
logabsdet=-inf for singular matrices. Complex matrices fall back to
``jnp.linalg`` (the complex path is CPU-only; this TPU backend has no
complex64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pivot_select(a: jnp.ndarray, k: int):
    """Partial pivot at elimination step k without row-swap gathers.

    a: (..., n, n). Returns (a_swapped, pivot_row (..., n), swap_sign (...,)).
    """
    n = a.shape[-1]
    col = jnp.abs(a[..., k:, k])                      # (..., n-k)
    p = jnp.argmax(col, axis=-1)                      # (...,)
    onehot = jax.nn.one_hot(p, n - k, dtype=a.dtype)  # (..., n-k)
    rows = a[..., k:, :]                              # (..., n-k, n)
    pivot_row = jnp.einsum("...r,...rc->...c", onehot, rows)
    old_k = a[..., k, :]
    # Write old row k into the pivot slot, then put the pivot row at k.
    rows = rows * (1 - onehot[..., None]) + onehot[..., None] * old_k[..., None, :]
    a = a.at[..., k:, :].set(rows)
    a = a.at[..., k, :].set(pivot_row)
    swap_sign = jnp.where(p == 0, jnp.ones_like(pivot_row[..., 0]),
                          -jnp.ones_like(pivot_row[..., 0]))
    return a, pivot_row, swap_sign


def _ge_slogdet(a: jnp.ndarray):
    """Unrolled, batch-vectorised GE -> (sign, logabsdet) over (..., n, n)."""
    n = a.shape[-1]
    sign = jnp.ones(a.shape[:-2], a.dtype)
    logabs = jnp.zeros(a.shape[:-2], a.dtype)
    for k in range(n):
        a, pivot_row, swap_sign = _pivot_select(a, k)
        piv = pivot_row[..., k]
        sign = sign * swap_sign * jnp.sign(piv)
        logabs = logabs + jnp.log(jnp.abs(piv))
        if k + 1 < n:
            safe = jnp.where(piv == 0, jnp.ones_like(piv), piv)
            m = a[..., k + 1:, k] / safe[..., None]
            a = a.at[..., k + 1:, :].add(
                -m[..., None] * pivot_row[..., None, :])
    return sign, logabs


def _gj_inv(a: jnp.ndarray):
    """Unrolled, batch-vectorised Gauss-Jordan inverse over (..., n, n)."""
    n = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    aug = jnp.concatenate([a, eye], axis=-1)          # (..., n, 2n)
    for k in range(n):
        col = jnp.abs(aug[..., k:, k])
        p = jnp.argmax(col, axis=-1)
        onehot = jax.nn.one_hot(p, n - k, dtype=a.dtype)
        rows = aug[..., k:, :]
        pivot_row = jnp.einsum("...r,...rc->...c", onehot, rows)
        old_k = aug[..., k, :]
        rows = (rows * (1 - onehot[..., None])
                + onehot[..., None] * old_k[..., None, :])
        aug = aug.at[..., k:, :].set(rows)
        piv = pivot_row[..., k]
        safe = jnp.where(piv == 0, jnp.ones_like(piv), piv)
        pivot_row = pivot_row / safe[..., None]
        aug = aug.at[..., k, :].set(pivot_row)
        # Eliminate column k from every other row in one vectorised update.
        m = aug[..., :, k]
        m = m.at[..., k].set(0)
        aug = aug - m[..., None] * pivot_row[..., None, :]
    return aug[..., :, n:]


@jax.custom_jvp
def _slogdet_real(a: jnp.ndarray):
    return _ge_slogdet(a)


@_slogdet_real.defjvp
def _slogdet_jvp(primals, tangents):
    (a,), (da,) = primals, tangents
    sign, logabs = _slogdet_real(a)
    ainv = inv(a)
    dlog = jnp.einsum("...ji,...ij->...", ainv, da)
    return (sign, logabs), (jnp.zeros_like(sign), dlog)


def slogdet(a: jnp.ndarray):
    """(sign, logabsdet) of batched (..., n, n) matrices.

    Real input takes the GE fast path with the closed-form derivative rules;
    complex input (CPU-only in this framework) dispatches to jnp.linalg
    OUTSIDE the custom rules, whose real-only tangent types would not apply.
    """
    if jnp.iscomplexobj(a):
        return jnp.linalg.slogdet(a)
    return _slogdet_real(a)


@jax.custom_jvp
def _inv_real(a: jnp.ndarray):
    return _gj_inv(a)


@_inv_real.defjvp
def _inv_jvp(primals, tangents):
    (a,), (da,) = primals, tangents
    y = _inv_real(a)
    dy = -jnp.einsum("...ij,...jk,...kl->...il", y, da, y)
    return y, dy


def inv(a: jnp.ndarray):
    """Inverse of batched (..., n, n) matrices (GE fast path for real)."""
    if jnp.iscomplexobj(a):
        return jnp.linalg.inv(a)
    return _inv_real(a)


# ---------------------------------------------------------------------------
# Complex matrices as (re, im) real pairs — the TPU backend has no complex64,
# so the complex-orbital determinant tail (ref wavefunction_Ynlm/nn.py:456,
# network_blocks.py:149-158) runs the same unrolled GE with explicit complex
# arithmetic on real component arrays. Outputs are (cos phase, sin phase,
# logabsdet); derivative rules are the complex closed forms split into parts:
# d log det A = tr(A^-1 dA)  =>  d logabs = Re tr, d phase = Im tr.
# ---------------------------------------------------------------------------


def _pivot_select_pair(ar: jnp.ndarray, ai: jnp.ndarray, k: int):
    """Partial pivot on |a_jk|^2 for the pair representation."""
    n = ar.shape[-1]
    col = ar[..., k:, k] ** 2 + ai[..., k:, k] ** 2
    p = jnp.argmax(col, axis=-1)
    onehot = jax.nn.one_hot(p, n - k, dtype=ar.dtype)

    def swap(a):
        rows = a[..., k:, :]
        pivot_row = jnp.einsum("...r,...rc->...c", onehot, rows)
        old_k = a[..., k, :]
        rows = (rows * (1 - onehot[..., None])
                + onehot[..., None] * old_k[..., None, :])
        a = a.at[..., k:, :].set(rows)
        a = a.at[..., k, :].set(pivot_row)
        return a, pivot_row

    ar, prow_r = swap(ar)
    ai, prow_i = swap(ai)
    swap_sign = jnp.where(p == 0, 1.0, -1.0).astype(ar.dtype)
    return ar, ai, prow_r, prow_i, swap_sign


def _ge_slogdet_pair(ar: jnp.ndarray, ai: jnp.ndarray):
    """Unrolled batched GE on (re, im) pairs -> (cos, sin, logabs)."""
    n = ar.shape[-1]
    cos = jnp.ones(ar.shape[:-2], ar.dtype)
    sin = jnp.zeros(ar.shape[:-2], ar.dtype)
    logabs = jnp.zeros(ar.shape[:-2], ar.dtype)
    for k in range(n):
        ar, ai, prow_r, prow_i, swap_sign = _pivot_select_pair(ar, ai, k)
        pr, pi = prow_r[..., k], prow_i[..., k]
        # hypot, NOT sqrt(pr^2 + pi^2): squaring underflows f32 at pivot
        # magnitudes ~1e-30, which real GE (|pivot| directly) survives —
        # observed as NaN log|psi| for far-electron probes on pair networks.
        mag = jnp.hypot(pr, pi)
        logabs = logabs + jnp.log(mag)
        safe_mag = jnp.where(mag == 0, 1.0, mag)
        # phase *= swap_sign * piv / |piv|
        ur, ui = pr / safe_mag, pi / safe_mag
        cos, sin = (swap_sign * (cos * ur - sin * ui),
                    swap_sign * (cos * ui + sin * ur))
        if k + 1 < n:
            br, bi = ar[..., k + 1:, k], ai[..., k + 1:, k]
            # m = a[k+1:, k] / piv as (b * conj(u)) / |piv|: two scaled
            # divisions, no squared magnitude in the denominator.
            urc, uic = ur[..., None], ui[..., None]
            sm = safe_mag[..., None]
            mr = (br * urc + bi * uic) / sm
            mi = (bi * urc - br * uic) / sm
            ar = ar.at[..., k + 1:, :].add(
                -(mr[..., None] * prow_r[..., None, :]
                  - mi[..., None] * prow_i[..., None, :]))
            ai = ai.at[..., k + 1:, :].add(
                -(mr[..., None] * prow_i[..., None, :]
                  + mi[..., None] * prow_r[..., None, :]))
    return cos, sin, logabs


def _gj_inv_pair(ar: jnp.ndarray, ai: jnp.ndarray):
    """Unrolled batched Gauss-Jordan inverse on (re, im) pairs."""
    n = ar.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=ar.dtype), ar.shape)
    ar = jnp.concatenate([ar, eye], axis=-1)            # (..., n, 2n)
    ai = jnp.concatenate([ai, jnp.zeros_like(eye)], axis=-1)
    for k in range(n):
        col = ar[..., k:, k] ** 2 + ai[..., k:, k] ** 2
        p = jnp.argmax(col, axis=-1)
        onehot = jax.nn.one_hot(p, n - k, dtype=ar.dtype)

        def swap(a, onehot=onehot, k=k):
            rows = a[..., k:, :]
            pivot_row = jnp.einsum("...r,...rc->...c", onehot, rows)
            old_k = a[..., k, :]
            rows = (rows * (1 - onehot[..., None])
                    + onehot[..., None] * old_k[..., None, :])
            a = a.at[..., k:, :].set(rows)
            return a, pivot_row

        ar, prow_r = swap(ar)
        ai, prow_i = swap(ai)
        pr, pi = prow_r[..., k], prow_i[..., k]
        mag2 = pr * pr + pi * pi
        safe2 = jnp.where(mag2 == 0, 1.0, mag2)[..., None]
        # pivot_row /= piv
        nr = (prow_r * pr[..., None] + prow_i * pi[..., None]) / safe2
        ni = (prow_i * pr[..., None] - prow_r * pi[..., None]) / safe2
        ar = ar.at[..., k, :].set(nr)
        ai = ai.at[..., k, :].set(ni)
        mr = ar[..., :, k].at[..., k].set(0)
        mi = ai[..., :, k].at[..., k].set(0)
        ar = ar - (mr[..., None] * nr[..., None, :]
                   - mi[..., None] * ni[..., None, :])
        ai = ai - (mr[..., None] * ni[..., None, :]
                   + mi[..., None] * nr[..., None, :])
    return ar[..., :, n:], ai[..., :, n:]


@jax.custom_jvp
def inv_pair(ar: jnp.ndarray, ai: jnp.ndarray):
    """Complex inverse on (re, im) pairs: (..., n, n) x2 -> (..., n, n) x2."""
    return _gj_inv_pair(ar, ai)


@inv_pair.defjvp
def _inv_pair_jvp(primals, tangents):
    (ar, ai), (dar, dai) = primals, tangents
    br, bi = inv_pair(ar, ai)

    def cmatmul(xr, xi, yr, yi):
        return (xr @ yr - xi @ yi, xr @ yi + xi @ yr)

    tr, ti = cmatmul(br, bi, dar, dai)
    dr, di = cmatmul(tr, ti, br, bi)
    return (br, bi), (-dr, -di)


@jax.custom_jvp
def slogdet_pair(ar: jnp.ndarray, ai: jnp.ndarray):
    """(cos, sin, logabsdet) of batched complex matrices given as (re, im).

    Matches jnp.linalg.slogdet on ar + 1j*ai with the complex sign written as
    (cos, sin). TPU-safe (no complex dtypes anywhere).
    """
    return _ge_slogdet_pair(ar, ai)


@slogdet_pair.defjvp
def _slogdet_pair_jvp(primals, tangents):
    (ar, ai), (dar, dai) = primals, tangents
    cos, sin, logabs = slogdet_pair(ar, ai)
    br, bi = inv_pair(ar, ai)
    # tr(A^-1 dA): Re and Im parts.
    re_tr = (jnp.einsum("...ji,...ij->...", br, dar)
             - jnp.einsum("...ji,...ij->...", bi, dai))
    im_tr = (jnp.einsum("...ji,...ij->...", br, dai)
             + jnp.einsum("...ji,...ij->...", bi, dar))
    # d phase = Im tr; phase enters through (cos, sin).
    return (cos, sin, logabs), (-sin * im_tr, cos * im_tr, re_tr)


# ---------------------------------------------------------------------------
# CLOSED DECISION (round 3, measured): no Pallas slogdet kernel.
# ---------------------------------------------------------------------------
# A fused VMEM batched-GE Pallas kernel (matrices one-per-lane, all n
# elimination steps resident in VMEM) was implemented and benchmarked on the
# production shapes on a real v5e chip (scripts history: runs/
# bench_slogdet_pallas.log, 2026-08-19): it LOST to this file's plain-XLA
# batched GE on all four shapes — 0.32x at (4096, 4, 4), 0.99x at
# (2048, 16, 4), 0.50x at (2048, 16, 16), 0.59x at (4096, 16, 8), values
# matching exactly. The tiny-matrix GE is latency-bound, not HBM-bound, and
# XLA's fused elementwise kernels already keep up; the lane-transpose the
# Pallas layout needs costs more than the fusion saves. XLA batched GE is
# the final answer for this op; the kernel was deleted (git history:
# "Pallas slogdet verdict").
