"""Forward-Laplacian evaluation of the local kinetic energy.

Implements the Forward Laplacian technique (Li et al., arXiv:2307.08214, the
reference's optional `folx` backend, ref ferminet/hamiltonian.py:143-157;
folx is not available in this environment) from scratch:

Every intermediate tensor u of the network forward pass is propagated as a
triple (u, J_u, L_u) where J_u[d] = d u / d x_d over all n = 3N electron
coordinates and L_u = sum_d d^2 u / d x_d^2. One pass through the network then
yields value, gradient and Laplacian of log|psi| simultaneously — no
reverse-mode graph and no 3N-fold re-entry of the gradient network (the
batched-tangent Laplacian in hamiltonian/kinetic.py pushes 3N tangents through
jvp-of-grad, costing ~3x more FLOPs).

Architecture: a small jaxpr interpreter with per-primitive rules covers the
orbital computation (models.network.Network.orbitals — elementwise ops, dot
products, gathers, reductions); the determinant tail is handled analytically:

    d   log|det A| = tr(A^-1 dA)
    d^2 log|det A| = tr(A^-1 d^2 A) - tr((A^-1 dA)^2)

and the signed log-sum-exp over determinants by the exact composition rule.
Real wavefunctions only (the TPU backend has no complex64; the complex path
keeps the batched-tangent implementation).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.extend import core as jcore


@dataclasses.dataclass
class FwdLap:
    """Value, per-coordinate jacobian (n, *shape) and laplacian (*shape)."""
    x: jnp.ndarray
    jac: jnp.ndarray
    lap: jnp.ndarray


def _is_fl(v) -> bool:
    return isinstance(v, FwdLap)


def _const(v) -> "FwdLap":
    raise TypeError("constants stay plain arrays")


# ---------------------------------------------------------------------------
# Primitive rules. Each rule takes (ndirs, eqn, *inputs) where inputs are
# FwdLap or plain arrays (constants), and returns FwdLap or plain array.
# ---------------------------------------------------------------------------

_RULES: Dict[str, Callable] = {}


def _rule(*names):
    def deco(fn):
        for n in names:
            _RULES[n] = fn
        return fn

    return deco


def _bind(eqn, *vals):
    out = eqn.primitive.bind(*vals, **eqn.params)
    return out


def _zeros_jac(ndirs, x):
    return jnp.zeros((ndirs,) + jnp.shape(x), jnp.result_type(x, jnp.float32))


def _lift(ndirs, v):
    """Constant -> FwdLap with zero derivatives."""
    if _is_fl(v):
        return v
    return FwdLap(v, _zeros_jac(ndirs, v), jnp.zeros_like(v))


def _linear_rule(ndirs, eqn, *ins):
    """Generic rule for primitives linear in every FwdLap input.

    Supports multiple-result primitives (e.g. split)."""
    multi = eqn.primitive.multiple_results
    xs = [i.x if _is_fl(i) else i for i in ins]
    out = _bind(eqn, *xs)

    fl_idx = [k for k, i in enumerate(ins) if _is_fl(i)]
    if not fl_idx:
        return out
    jacs = [ins[k].jac for k in fl_idx]

    # For multi-operand linear combinations a constant operand's tangent is
    # zero, not the constant itself. Only float (inexact) operands carry
    # tangents: integer/bool operands (gather/scatter/dynamic-slice indices,
    # select predicates) must pass through unchanged or the tangent is
    # scattered to the wrong positions.
    def jac_one(*tangs):
        vals = []
        ti = iter(tangs)
        for i in ins:
            if _is_fl(i):
                vals.append(next(ti))
            elif (_affine_needs_zero(eqn)
                  and jnp.issubdtype(jnp.result_type(i), jnp.inexact)):
                vals.append(jnp.zeros_like(i))
            else:
                vals.append(i)
        res = _bind(eqn, *vals)
        return tuple(res) if multi else res

    jac = jax.vmap(jac_one)(*jacs)
    laps = [ins[k].lap for k in fl_idx]
    lap = jac_one(*laps)
    if multi:
        return [FwdLap(o, j, l) for o, j, l in zip(out, jac, lap)]
    return FwdLap(out, jac, lap)


def _affine_needs_zero(eqn) -> bool:
    """True for primitives where constant float operands must be zeroed in
    tangent space (multi-operand linear combinations: add/sub/concatenate/
    pad/scatter outputs combine contributions, so a constant data operand's
    tangent is zero, not the constant)."""
    return eqn.primitive.name in ("add", "sub", "add_any", "concatenate",
                                  "pad", "dynamic_update_slice", "scatter",
                                  "scatter-add")


for _name in ("broadcast_in_dim", "reshape", "transpose", "squeeze",
              "slice", "rev", "reduce_sum", "convert_element_type",
              "expand_dims", "copy", "concatenate", "pad", "gather",
              "dynamic_slice", "add", "sub", "add_any", "neg", "real",
              "dynamic_update_slice", "split", "tile", "scatter",
              "scatter-add"):
    _RULES[_name] = _linear_rule


@_rule("mul")
def _mul_rule(ndirs, eqn, a, b):
    # Operand shapes may differ (numpy broadcasting); per-direction vmap keeps
    # the jacobian aligned with the broadcast output shape.
    af, bf = _is_fl(a), _is_fl(b)
    if not af and not bf:
        return a * b
    av = a.x if af else a
    bv = b.x if bf else b
    out = av * bv
    if af and bf:
        jac = jax.vmap(lambda ja, jb: ja * bv + av * jb)(a.jac, b.jac)
        cross = jax.vmap(lambda ja, jb: ja * jb)(a.jac, b.jac)
        lap = a.lap * bv + av * b.lap + 2.0 * jnp.sum(cross, axis=0)
    elif af:
        jac = jax.vmap(lambda ja: ja * bv)(a.jac)
        lap = a.lap * bv
    else:
        jac = jax.vmap(lambda jb: av * jb)(b.jac)
        lap = av * b.lap
    return FwdLap(out, jac, lap)


@_rule("div")
def _div_rule(ndirs, eqn, a, b):
    if not _is_fl(b):
        inv = 1.0 / b
        if not _is_fl(a):
            return a * inv
        return FwdLap(a.x * inv, jax.vmap(lambda j: j * inv)(a.jac),
                      a.lap * inv)
    binv = 1.0 / b.x
    binv_fl = FwdLap(
        binv,
        jax.vmap(lambda j: -j * binv * binv)(b.jac),
        -b.lap * binv ** 2 + 2.0 * jnp.sum(b.jac ** 2, axis=0) * binv ** 3)
    return _mul_rule(ndirs, eqn, a, binv_fl)


def _elementwise(d1, d2):
    """Rule factory for unary elementwise u with u', u'' callables."""

    def rule(ndirs, eqn, a):
        if not _is_fl(a):
            return _bind(eqn, a)
        out = _bind(eqn, a.x)
        du = d1(a.x, out)
        ddu = d2(a.x, out)
        jac = du[None] * a.jac
        lap = du * a.lap + ddu * jnp.sum(a.jac ** 2, axis=0)
        return FwdLap(out, jac, lap)

    return rule


_RULES["tanh"] = _elementwise(lambda x, u: 1 - u ** 2,
                              lambda x, u: -2 * u * (1 - u ** 2))
_RULES["exp"] = _elementwise(lambda x, u: u, lambda x, u: u)
_RULES["log"] = _elementwise(lambda x, u: 1 / x, lambda x, u: -1 / x ** 2)
_RULES["sqrt"] = _elementwise(lambda x, u: 0.5 / u,
                              lambda x, u: -0.25 / (u * x))
_RULES["rsqrt"] = _elementwise(lambda x, u: -0.5 * u / x,
                               lambda x, u: 0.75 * u / (x * x))
_RULES["sin"] = _elementwise(lambda x, u: jnp.cos(x), lambda x, u: -u)
_RULES["cos"] = _elementwise(lambda x, u: -jnp.sin(x), lambda x, u: -u)
_RULES["logistic"] = _elementwise(lambda x, u: u * (1 - u),
                                  lambda x, u: u * (1 - u) * (1 - 2 * u))
_RULES["erf"] = _elementwise(
    lambda x, u: 2 / np.sqrt(np.pi) * jnp.exp(-x * x),
    lambda x, u: -4 * x / np.sqrt(np.pi) * jnp.exp(-x * x))
_RULES["abs"] = _elementwise(lambda x, u: jnp.sign(x),
                             lambda x, u: jnp.zeros_like(x))
_RULES["sign"] = _elementwise(lambda x, u: jnp.zeros_like(x),
                              lambda x, u: jnp.zeros_like(x))
_RULES["log1p"] = _elementwise(lambda x, u: 1 / (1 + x),
                               lambda x, u: -1 / (1 + x) ** 2)
_RULES["exp2"] = _elementwise(lambda x, u: u * np.log(2.0),
                              lambda x, u: u * np.log(2.0) ** 2)
_RULES["square"] = _elementwise(lambda x, u: 2.0 * x,
                                lambda x, u: jnp.full_like(x, 2.0))
_RULES["cbrt"] = _elementwise(lambda x, u: 1.0 / (3.0 * u * u),
                              lambda x, u: -2.0 / (9.0 * u ** 5))
_RULES["sinh"] = _elementwise(lambda x, u: jnp.cosh(x), lambda x, u: u)
_RULES["cosh"] = _elementwise(lambda x, u: jnp.sinh(x), lambda x, u: u)
_RULES["expm1"] = _elementwise(lambda x, u: u + 1.0, lambda x, u: u + 1.0)
_RULES["atan"] = _elementwise(lambda x, u: 1.0 / (1.0 + x * x),
                              lambda x, u: -2.0 * x / (1.0 + x * x) ** 2)
_RULES["asin"] = _elementwise(lambda x, u: jax.lax.rsqrt(1.0 - x * x),
                              lambda x, u: x * (1.0 - x * x) ** -1.5)
_RULES["acos"] = _elementwise(lambda x, u: -jax.lax.rsqrt(1.0 - x * x),
                              lambda x, u: -x * (1.0 - x * x) ** -1.5)
_RULES["asinh"] = _elementwise(lambda x, u: jax.lax.rsqrt(1.0 + x * x),
                               lambda x, u: -x * (1.0 + x * x) ** -1.5)


@_rule("clamp")
def _clamp_rule(ndirs, eqn, lo, x, hi):
    """clamp(lo, x, hi): piecewise selection; derivative follows the active
    operand (a.e., like max/min)."""
    lov = lo.x if _is_fl(lo) else lo
    xv = x.x if _is_fl(x) else x
    hiv = hi.x if _is_fl(hi) else hi
    out = _bind(eqn, lov, xv, hiv)
    lifted = [_lift(ndirs, v) for v in (lo, x, hi)]
    full = lambda a: jnp.broadcast_to(a, out.shape)
    jfull = lambda j: jnp.broadcast_to(
        j.reshape((ndirs,) + (1,) * (out.ndim - (j.ndim - 1)) + j.shape[1:]),
        (ndirs,) + out.shape)
    low, mid = full(xv < lov), full((xv >= lov) & (xv <= hiv))
    jlo, jx, jhi = (jfull(v.jac) for v in lifted)
    llo, lx, lhi = (full(v.lap) for v in lifted)
    jac = jnp.where(low[None], jlo, jnp.where(mid[None], jx, jhi))
    lap = jnp.where(low, llo, jnp.where(mid, lx, lhi))
    return FwdLap(out, jac, lap)


_RULES["cumsum"] = _linear_rule


@_rule("integer_pow")
def _integer_pow_rule(ndirs, eqn, a):
    k = eqn.params["y"]
    if not _is_fl(a):
        return _bind(eqn, a)
    out = a.x ** k
    du = k * a.x ** (k - 1)
    ddu = k * (k - 1) * a.x ** (k - 2) if k != 1 else jnp.zeros_like(a.x)
    jac = du[None] * a.jac
    lap = du * a.lap + ddu * jnp.sum(a.jac ** 2, axis=0)
    return FwdLap(out, jac, lap)


@_rule("pow")
def _pow_rule(ndirs, eqn, a, b):
    if _is_fl(b):
        raise NotImplementedError("pow with differentiated exponent")
    if not _is_fl(a):
        return _bind(eqn, a, b)
    out = a.x ** b
    du = b * a.x ** (b - 1)
    ddu = b * (b - 1) * a.x ** (b - 2)
    return FwdLap(out, du[None] * a.jac,
                  du * a.lap + ddu * jnp.sum(a.jac ** 2, axis=0))


@_rule("max", "min")
def _minmax_rule(ndirs, eqn, a, b):
    av = a.x if _is_fl(a) else a
    bv = b.x if _is_fl(b) else b
    out = _bind(eqn, av, bv)
    pick_a = (out == av)

    # Operands may broadcast (e.g. a rank-0 clamp constant): pad the operand
    # rank on the left, then expand jac/lap to the output shape.
    def expand_jac(j):
        pad = (1,) * (out.ndim - (j.ndim - 1))
        j = j.reshape((ndirs,) + pad + j.shape[1:])
        return jnp.broadcast_to(j, (ndirs,) + out.shape)

    def expand_lap(l):
        pad = (1,) * (out.ndim - l.ndim)
        return jnp.broadcast_to(l.reshape(pad + l.shape), out.shape)

    ja = expand_jac(a.jac) if _is_fl(a) else _zeros_jac(ndirs, out)
    jb = expand_jac(b.jac) if _is_fl(b) else _zeros_jac(ndirs, out)
    la = expand_lap(a.lap) if _is_fl(a) else jnp.zeros_like(out)
    lb = expand_lap(b.lap) if _is_fl(b) else jnp.zeros_like(out)
    jac = jnp.where(pick_a[None], ja, jb)
    lap = jnp.where(pick_a, la, lb)
    return FwdLap(out, jac, lap)


@_rule("select_n")
def _select_rule(ndirs, eqn, pred, *cases):
    predv = pred.x if _is_fl(pred) else pred
    vals = [c.x if _is_fl(c) else c for c in cases]
    out = _bind(eqn, predv, *vals)
    if not any(_is_fl(c) for c in cases):
        return out
    lifted = [_lift(ndirs, c) for c in cases]
    # select_n requires `which` scalar or case-shaped; the jac cases gain a
    # leading ndirs axis, so expand a (possibly scalar) pred to match them.
    pred_full = jnp.broadcast_to(predv, out.shape)
    jac = _bind(eqn, jnp.broadcast_to(pred_full[None], (ndirs,) + out.shape),
                *[jnp.broadcast_to(c.jac, (ndirs,) + out.shape)
                  for c in lifted])
    lap = _bind(eqn, predv, *[jnp.broadcast_to(c.lap, out.shape)
                              for c in lifted])
    return FwdLap(out, jac, lap)


@_rule("reduce_max", "reduce_min")
def _reduce_max_rule(ndirs, eqn, a):
    if not _is_fl(a):
        return _bind(eqn, a)
    out = _bind(eqn, a.x)
    axes = eqn.params["axes"]
    expanded = jnp.expand_dims(out, axes) if axes else out
    mask = (a.x == expanded)
    mask = mask / jnp.sum(mask, axis=axes, keepdims=True)
    jac = jnp.sum(a.jac * mask[None], axis=tuple(ax + 1 for ax in axes))
    lap = jnp.sum(a.lap * mask, axis=axes)
    return FwdLap(out, jac, lap)


@_rule("reduce_prod")
def _reduce_prod_rule(ndirs, eqn, a):
    """prod over axes. Division-form exclusive products: exact wherever no
    reduced element is zero (zeros get the a.e. subgradient, like abs/sign)."""
    if not _is_fl(a):
        return _bind(eqn, a)
    out = _bind(eqn, a.x)
    axes = eqn.params["axes"]
    jax_axes = tuple(ax + 1 for ax in axes)
    expanded = jnp.expand_dims(out, axes) if axes else out
    safe = jnp.where(a.x == 0, 1.0, a.x)
    excl = jnp.where(a.x == 0, 0.0, expanded / safe)  # prod_{k != i} u_k
    jac = jnp.sum(a.jac * excl[None], axis=jax_axes)
    # sum_{i != j} out/(u_i u_j) J_di J_dj = out * (s1_d^2 - s2_d)
    s1 = jnp.sum(a.jac / safe[None], axis=jax_axes)
    s2 = jnp.sum((a.jac / safe[None]) ** 2, axis=jax_axes)
    lap = (jnp.sum(a.lap * excl, axis=axes)
           + jnp.sum(s1 ** 2 - s2, axis=0) * out)
    return FwdLap(out, jac, lap)


def _tangent_dot_precision():
    """Optional precision override for TANGENT-propagation dots.

    The primal chain keeps the package-wide matmul pin (highest — the
    2026-08-18 bf16 corruption lives in forward values amplified by the
    determinant tail), but the Jacobian/Laplacian propagation dots are the
    FLOPs-heavy part of the forward Laplacian (ndirs = nelec*ndim extra
    contractions per layer) and enter E_L linearly, without the sign-flip
    amplification. AIQMC_FWDLAP_TANGENT_PRECISION=default relaxes ONLY those
    dots — a selective-precision lever for the VERDICT-r2 throughput item,
    to be trusted on a backend only after scripts/probe_el_cross_device.py
    and both forward probes PASS with the variable set."""
    name = os.environ.get("AIQMC_FWDLAP_TANGENT_PRECISION", "")
    if not name:
        return None
    return jax.lax.Precision(name.lower())


@_rule("dot_general")
def _dot_rule(ndirs, eqn, a, b):
    av = a.x if _is_fl(a) else a
    bv = b.x if _is_fl(b) else b
    out = _bind(eqn, av, bv)
    tangent_prec = _tangent_dot_precision()

    def dot(x, y):
        if tangent_prec is None:
            return _bind(eqn, x, y)
        params = dict(eqn.params)
        params["precision"] = (tangent_prec, tangent_prec)
        return eqn.primitive.bind(x, y, **params)

    jac_terms = []
    lap = jnp.zeros_like(out)
    if _is_fl(a):
        jac_terms.append(jax.vmap(lambda j: dot(j, bv))(a.jac))
        lap = lap + dot(a.lap, bv)
    if _is_fl(b):
        jac_terms.append(jax.vmap(lambda j: dot(av, j))(b.jac))
        lap = lap + dot(av, b.lap)
    if _is_fl(a) and _is_fl(b):
        cross = jax.vmap(dot)(a.jac, b.jac)
        lap = lap + 2.0 * jnp.sum(cross, axis=0)
    jac = jac_terms[0]
    for t in jac_terms[1:]:
        jac = jac + t
    return FwdLap(out, jac, lap)


@_rule("stop_gradient")
def _stop_grad_rule(ndirs, eqn, a):
    return a.x if _is_fl(a) else a


@_rule("gt", "lt", "ge", "le", "eq", "ne", "sign", "round", "floor", "ceil",
       "is_finite", "and", "or", "not", "xor", "reduce_and", "reduce_or",
       "argmax", "argmin")
def _nondiff_rule(ndirs, eqn, *ins):
    """Comparisons and piecewise-constant ops: derivative is zero a.e., so the
    result is a plain (non-FwdLap) array."""
    return _bind(eqn, *[i.x if _is_fl(i) else i for i in ins])


_CALL_PRIMS = ("pjit", "jit", "closed_call", "custom_jvp_call",
               "custom_vjp_call", "custom_jvp_call_jaxpr", "remat",
               "checkpoint", "core_call", "xla_call")


def _inner_jaxpr(eqn):
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        if key in eqn.params:
            j = eqn.params[key]
            return j
    raise NotImplementedError(
        f"call primitive {eqn.primitive.name} without inner jaxpr")


# ---------------------------------------------------------------------------
# Interpreter.
# ---------------------------------------------------------------------------

def _interpret(jaxpr, consts, args, ndirs):
    env: Dict[Any, Any] = {}

    def read(v):
        if isinstance(v, jcore.Literal):
            return v.val
        return env[v]

    def write(v, val):
        env[v] = val

    for v, c in zip(jaxpr.constvars, consts):
        write(v, c)
    for v, a in zip(jaxpr.invars, args):
        write(v, a)

    for eqn in jaxpr.eqns:
        ins = [read(v) for v in eqn.invars]
        name = eqn.primitive.name
        if name in _CALL_PRIMS:
            inner = _inner_jaxpr(eqn)
            if hasattr(inner, "jaxpr"):  # ClosedJaxpr
                outs = _interpret(inner.jaxpr, inner.consts, ins, ndirs)
            else:
                outs = _interpret(inner, [], ins, ndirs)
            if not eqn.primitive.multiple_results:
                outs = [outs] if not isinstance(outs, (list, tuple)) else outs
        elif not any(_is_fl(i) for i in ins):
            out = _bind(eqn, *ins)
            outs = out if isinstance(out, (list, tuple)) else [out]
            if not eqn.primitive.multiple_results:
                outs = [out]
        elif name in _RULES:
            out = _RULES[name](ndirs, eqn, *ins)
            outs = out if isinstance(out, (list, tuple)) else [out]
        else:
            raise NotImplementedError(
                f"forward_laplacian: no rule for primitive '{name}'")
        for v, o in zip(eqn.outvars, outs):
            write(v, o)
    return [read(v) for v in jaxpr.outvars]


def forward_laplacian(fun):
    """Transforms fun: (n,) -> pytree of arrays into x -> pytree of FwdLap."""

    def transformed(x):
        n = x.shape[0]
        closed = jax.make_jaxpr(fun)(x)
        x_fl = FwdLap(x, jnp.eye(n, dtype=x.dtype), jnp.zeros_like(x))
        flat_out = _interpret(closed.jaxpr, closed.consts, [x_fl], n)
        out = [(o if _is_fl(o) else _lift(n, o)) for o in flat_out]
        return out if len(out) > 1 else out[0]

    return transformed


# ---------------------------------------------------------------------------
# Determinant tail: log|sum_k s_k det A_k| from FwdLap orbital tensors.
# ---------------------------------------------------------------------------

def slogdet_fwdlap(orb: FwdLap):
    """FwdLap (ndet, ne, ne) -> per-det (sign, logabs value, grad, lap)."""
    A = orb.x          # (ndet, ne, ne)
    J = orb.jac        # (n, ndet, ne, ne)
    L = orb.lap        # (ndet, ne, ne)
    from aiqmc_tpu.ops import slogdet as fast_slogdet
    sign, logabs = fast_slogdet.slogdet(A)
    Ainv = fast_slogdet.inv(A)  # (ndet, ne, ne)
    # grad_d log|det A_k| = tr(Ainv_k J_dk)
    grad = jnp.einsum("kij,dkji->dk", Ainv, J)
    M = jnp.einsum("kij,dkjl->dkil", Ainv, J)  # Ainv @ J_d
    lap = (jnp.einsum("kij,kji->k", Ainv, L)
           - jnp.einsum("dkil,dkli->k", M, M))
    return sign, logabs, grad, lap


def logpsi_fwdlap(orb: FwdLap):
    """FwdLap of the determinant list -> (sign, log|psi|, grad, lap of log|psi|).

    psi = sum_k s_k exp(l_k) with uniform weights (ref network_blocks
    logdet_matmul semantics for real wavefunctions).
    """
    sign, logabs, grad, lap = slogdet_fwdlap(orb)
    m = jnp.max(logabs)
    terms = sign * jnp.exp(logabs - m)      # (ndet,)
    S = jnp.sum(terms)
    w = terms / S                            # signed weights summing to 1
    log_out = m + jnp.log(jnp.abs(S))
    sign_out = jnp.sign(S)
    grad_out = jnp.einsum("k,dk->d", w, grad)
    # lap log|psi| = sum_k w_k (lap l_k + |grad l_k|^2) - |sum_k w_k grad l_k|^2
    lap_out = (jnp.sum(w * (lap + jnp.sum(grad ** 2, axis=0)))
               - jnp.sum(grad_out ** 2))
    return sign_out, log_out, grad_out, lap_out


def make_forward_kinetic(orbitals_apply):
    """Kinetic energy -1/2 (lap log|psi| + |grad log|psi||^2) via one
    forward-Laplacian pass. Real wavefunctions only."""

    def kinetic(params, data):
        def orb_fn(x):
            return orbitals_apply(params, x, data.spins, data.atoms,
                                  data.charges)[0]

        orb = forward_laplacian(orb_fn)(data.positions)
        _, _, grad, lap = logpsi_fwdlap(orb)
        return -0.5 * (lap + jnp.sum(grad ** 2))

    return kinetic


# ---------------------------------------------------------------------------
# Complex wavefunctions in the TPU-safe (re, im) pair representation
# (models.network complex_pairs=True; ref nn.py:456): the orbital network is
# all-real, so the same interpreter propagates both components; only the
# determinant tail needs complex arithmetic, done here on real pairs.
# ---------------------------------------------------------------------------

def slogdet_pair_fwdlap(orb_r: FwdLap, orb_i: FwdLap):
    """FwdLap (re, im) orbital tensors (ndet, ne, ne) -> per-det
    (cos, sin, logabs, (grad_re, grad_im), (lap_re, lap_im)) of
    L_k = log det A_k (complex), all real arrays.

    Same determinant identities as ``slogdet_fwdlap`` evaluated in complex
    pair arithmetic: d L = tr(A^-1 dA), d^2 L = tr(A^-1 d^2 A) - tr((A^-1 dA)^2).
    """
    from aiqmc_tpu.ops import slogdet as fast_slogdet
    Ar, Ai = orb_r.x, orb_i.x
    Jr, Ji = orb_r.jac, orb_i.jac          # (n, ndet, ne, ne)
    Lr, Li = orb_r.lap, orb_i.lap          # (ndet, ne, ne)
    cos, sin, logabs = fast_slogdet.slogdet_pair(Ar, Ai)
    Br, Bi = fast_slogdet.inv_pair(Ar, Ai)
    # grad_d L_k = tr(A^-1 J_d)
    gr = (jnp.einsum("kij,dkji->dk", Br, Jr)
          - jnp.einsum("kij,dkji->dk", Bi, Ji))
    gi = (jnp.einsum("kij,dkji->dk", Br, Ji)
          + jnp.einsum("kij,dkji->dk", Bi, Jr))
    # M_d = A^-1 J_d
    Mr = (jnp.einsum("kij,dkjl->dkil", Br, Jr)
          - jnp.einsum("kij,dkjl->dkil", Bi, Ji))
    Mi = (jnp.einsum("kij,dkjl->dkil", Br, Ji)
          + jnp.einsum("kij,dkjl->dkil", Bi, Jr))
    # sum_d tr(M_d M_d), complex
    tr2_r = (jnp.einsum("dkil,dkli->k", Mr, Mr)
             - jnp.einsum("dkil,dkli->k", Mi, Mi))
    tr2_i = 2.0 * jnp.einsum("dkil,dkli->k", Mr, Mi)
    lap_r = (jnp.einsum("kij,kji->k", Br, Lr)
             - jnp.einsum("kij,kji->k", Bi, Li)) - tr2_r
    lap_i = (jnp.einsum("kij,kji->k", Br, Li)
             + jnp.einsum("kij,kji->k", Bi, Lr)) - tr2_i
    return cos, sin, logabs, (gr, gi), (lap_r, lap_i)


def logpsi_fwdlap_pair(orb_r: FwdLap, orb_i: FwdLap):
    """(phase, log|psi|, grad log psi pair, lap log psi pair) for
    psi = sum_k det A_k with complex determinants carried as (re, im)
    (uniform weights — ref network_blocks logdet_matmul_pair semantics)."""
    cos, sin, logabs, (gr, gi), (lap_r, lap_i) = slogdet_pair_fwdlap(
        orb_r, orb_i)
    m = jnp.max(logabs)
    scale = jnp.exp(logabs - m)
    tr_, ti_ = cos * scale, sin * scale      # exp(L_k - m), complex pair
    Sr, Si = jnp.sum(tr_), jnp.sum(ti_)
    s2 = Sr * Sr + Si * Si
    # complex weights w_k = exp(L_k) / sum_j exp(L_j)
    wr = (tr_ * Sr + ti_ * Si) / s2
    wi = (ti_ * Sr - tr_ * Si) / s2
    log_out = m + 0.5 * jnp.log(s2)
    phase_out = jnp.arctan2(Si, Sr)
    # grad log psi = sum_k w_k grad L_k
    Gr = jnp.einsum("k,dk->d", wr, gr) - jnp.einsum("k,dk->d", wi, gi)
    Gi = jnp.einsum("k,dk->d", wr, gi) + jnp.einsum("k,dk->d", wi, gr)
    # lap log psi = sum_k w_k (lap L_k + sum_d (grad_d L_k)^2)
    #               - sum_d (grad_d log psi)^2, all complex
    g2r = jnp.sum(gr * gr - gi * gi, axis=0)
    g2i = 2.0 * jnp.sum(gr * gi, axis=0)
    tot_r, tot_i = lap_r + g2r, lap_i + g2i
    L_out_r = jnp.sum(wr * tot_r - wi * tot_i) - jnp.sum(Gr * Gr - Gi * Gi)
    L_out_i = jnp.sum(wr * tot_i + wi * tot_r) - 2.0 * jnp.sum(Gr * Gi)
    return phase_out, log_out, (Gr, Gi), (L_out_r, L_out_i)


def make_forward_kinetic_pair(orbitals_apply, twist_k=None, ndim: int = 3):
    """Complex kinetic energy -1/2 (lap log psi + (grad log psi)^2) as a
    stacked real pair [Re, Im] via one forward-Laplacian pass.

    Handles both complex-pair orbitals (the network returns an (re, im)
    tuple) and REAL orbitals evaluated at a twist (pbc/twist.real_to_angle:
    the sign's phase gradient is zero a.e., so Im components vanish before
    the boost).

    twist_k: optional Cartesian twist wavevector (ndim,). The plane-wave
    boost exp(i k . sum_i r_i) (pbc/twist.apply_twist wraps ``apply``, NOT
    ``orbitals``) contributes exactly grad_phase += k per electron and
    nothing to the phase Laplacian, so it is folded in analytically here.
    """

    def kinetic(params, data):
        def orb_fn(x):
            return orbitals_apply(params, x, data.spins, data.atoms,
                                  data.charges)[0]

        res = forward_laplacian(orb_fn)(data.positions)
        if isinstance(res, (list, tuple)):
            _, _, (Gr, Gi), (Lr, Li) = logpsi_fwdlap_pair(res[0], res[1])
        else:
            _, _, Gr, Lr = logpsi_fwdlap(res)
            Gi = jnp.zeros_like(Gr)
            Li = jnp.zeros_like(Lr)
        if twist_k is not None:
            k = jnp.asarray(twist_k, dtype=Gr.dtype)
            Gi = Gi + jnp.tile(k, Gr.shape[0] // ndim)
        re = -0.5 * (Lr + jnp.sum(Gr * Gr) - jnp.sum(Gi * Gi))
        im = -0.5 * (Li + 2.0 * jnp.sum(Gr * Gi))
        return jnp.stack([re, im])

    return kinetic
