"""Neural-network building blocks.

Parity with ref ``AIQMCrelease3/wavefunction_Ynlm/network_blocks.py``: linear and
"convolutional" (grouped elementwise-reduce) layers, slogdet with a 1x1 fast path,
and the log-sum-exp determinant combination. Initialisation distributions match the
reference exactly (normal / sqrt(fan_in), normal biases) so KFAC scaling and
training dynamics are comparable.
"""

from __future__ import annotations

import functools
import itertools
from typing import MutableMapping, Optional, Sequence, Tuple

import chex
import jax
import jax.numpy as jnp


def array_partitions(sizes: Sequence[int]) -> Sequence[int]:
    """Split indices for partitioning an array (ref network_blocks.py:25-36)."""
    return list(itertools.accumulate(sizes))[:-1]


def init_linear_layer(key: chex.PRNGKey, in_dim: int, out_dim: int,
                      include_bias: bool = True) -> MutableMapping[str, jnp.ndarray]:
    """x @ w + b with w ~ N(0, 1/in_dim) (ref network_blocks.py:63-86)."""
    key1, key2 = jax.random.split(key)
    weight = jax.random.normal(key1, shape=(in_dim, out_dim)) / jnp.sqrt(float(in_dim))
    if include_bias:
        bias = jax.random.normal(key2, shape=(out_dim,))
        return {"w": weight, "b": bias}
    return {"w": weight}


# Activation tape: when a capture context is active, every linear_layer call
# appends (input, weight) so curvature estimators (optim.kfac) can recover
# per-layer activations without jaxpr surgery. Appends happen at trace time;
# the recorded values are ordinary tracers, valid as outputs of the traced
# function. This replaces the reference's kfac_jax graph-pattern matching
# (ref curvature_tags_and_blocks.py:194-263).
_ACTIVATION_TAPE: Optional[list] = None
_ACTIVATION_PROBES: Optional[list] = None


class capture_activations:
    """Context manager collecting (x, w) for every dense layer application.

    probes: optional list aligned with CALL ORDER (the order entries appear
    on the tape); call i with ``probes[i] is not None`` has probes[i] added
    to its output. This is the per-call bias-perturbation hook optim.kfac
    differentiates to obtain per-call output gradients — per CALL, not per
    layer, so layers invoked several times in one evaluation (the shared
    excited-state ansatz evaluates the base network once per state
    configuration) get independent probes.
    """

    def __init__(self, probes: Optional[list] = None):
        self._probes = probes

    def __enter__(self):
        global _ACTIVATION_TAPE, _ACTIVATION_PROBES
        self._saved = _ACTIVATION_TAPE
        self._saved_probes = _ACTIVATION_PROBES
        _ACTIVATION_TAPE = []
        _ACTIVATION_PROBES = self._probes
        return _ACTIVATION_TAPE

    def __exit__(self, exc_type, exc_val, exc_tb):
        global _ACTIVATION_TAPE, _ACTIVATION_PROBES
        _ACTIVATION_TAPE = self._saved
        _ACTIVATION_PROBES = self._saved_probes
        return False


# Optional reduced-precision matmul inputs (cfg.network.matmul_dtype). On TPU
# the MXU already multiplies f32 operands in bf16 passes at DEFAULT precision;
# casting the operands additionally halves activation/weight bandwidth into
# the MXU. Accumulation stays f32 (preferred_element_type) and the determinant
# path is untouched. Set at build time (trace-time static).
_MATMUL_DTYPE = None


def set_matmul_dtype(dtype) -> None:
    """dtype=None restores full precision; jnp.bfloat16 enables bf16 inputs."""
    global _MATMUL_DTYPE
    _MATMUL_DTYPE = dtype


def linear_layer(x: jnp.ndarray, w: jnp.ndarray,
                 b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Evaluates x @ w (+ b). The matmul is the MXU workhorse of the model."""
    probe = None
    if _ACTIVATION_TAPE is not None:
        idx = len(_ACTIVATION_TAPE)
        _ACTIVATION_TAPE.append((x, w))
        if _ACTIVATION_PROBES is not None and idx < len(_ACTIVATION_PROBES):
            probe = _ACTIVATION_PROBES[idx]
    if _MATMUL_DTYPE is not None and not jnp.iscomplexobj(x):
        y = jnp.dot(x.astype(_MATMUL_DTYPE), w.astype(_MATMUL_DTYPE),
                    preferred_element_type=jnp.float32)
    else:
        y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    if probe is not None:
        y = y + probe
    return y


vmap_linear_layer = jax.vmap(linear_layer, in_axes=(0, None, None), out_axes=0)

# Group size of the reduce layer: the reference hardcodes 4
# (network_blocks.py:109 "reshape(nelectrons, -1, 4)").
CONV_GROUP = 4


def conv_padded_dim(in_dim: int) -> int:
    """Input width after zero-padding to a CONV_GROUP multiple.

    The reference requires feature dims divisible by 4 (network_blocks.py:109);
    padding removes that constraint on hidden/feature sizes.
    """
    return -(-in_dim // CONV_GROUP) * CONV_GROUP


def init_convolu_layer(nelectrons: int, key: chex.PRNGKey, in_dim_1: int,
                       in_dim_2: int, include_bias: bool = True
                       ) -> MutableMapping[str, jnp.ndarray]:
    """Per-electron elementwise weights for the grouped-reduce layer.

    Ref network_blocks.py:88-102: w has shape (nelectrons, in_dim_2) scaled by
    1/sqrt(in_dim_1); bias has shape (nelectrons, in_dim_2 / 4). in_dim_2 must
    already be padded to a CONV_GROUP multiple (see conv_padded_dim).
    """
    if in_dim_2 % CONV_GROUP != 0:
        raise ValueError(
            f"convolu layer input dim {in_dim_2} must be divisible by {CONV_GROUP}")
    key1, key2 = jax.random.split(key)
    weight = jax.random.normal(key1, shape=(in_dim_1, in_dim_2)) / jnp.sqrt(
        float(in_dim_1))
    if include_bias:
        bias = jax.random.normal(key2, shape=(nelectrons, in_dim_2 // CONV_GROUP))
        return {"w": weight, "b": bias}
    return {"w": weight}


def convolu_layer(nelectrons: int, x: jnp.ndarray, w: jnp.ndarray,
                  b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Grouped elementwise-reduce layer (ref network_blocks.py:106-116).

    Reshapes (nelec, D) inputs and weights to (nelec, D/4, 4), takes the mean of
    the elementwise product over the trailing group of 4 and adds a per-electron
    bias. Inputs narrower than the weights are zero-padded. Pure VPU work; XLA
    fuses it with the surrounding tanh.
    """
    pad = w.shape[-1] - x.shape[-1]
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    x = jnp.reshape(x, (nelectrons, -1, CONV_GROUP))
    w = jnp.reshape(w, (nelectrons, -1, CONV_GROUP))
    y = jnp.mean(x * w, axis=-1)
    return y + b if b is not None else y


def slogdet(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sign/phase and log|det| with a fast 1x1 path (ref network_blocks.py:138-158).

    Real matrices use the batch-vectorised unrolled elimination in
    ``ops.slogdet`` (XLA's LU loop is slow for many tiny matrices on TPU)."""
    if x.shape[-1] == 1:
        if jnp.iscomplexobj(x):
            sign = x[..., 0, 0] / jnp.abs(x[..., 0, 0])
        else:
            sign = jnp.sign(x[..., 0, 0])
        logdet = jnp.log(jnp.abs(x[..., 0, 0]))
    else:
        from aiqmc_tpu.ops import slogdet as fast_slogdet
        sign, logdet = fast_slogdet.slogdet(x)
    return sign, logdet


def psi_ratio_real_imag(dmag: jnp.ndarray,
                        phase_new: jnp.ndarray,
                        phase_old: jnp.ndarray,
                        complex_output: bool
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Re, Im) of psi_new/psi_old from (phase, log|psi|) network outputs.

    The network's first output is a true phase ANGLE only for complex
    wavefunctions; REAL wavefunctions return a SIGN in {-1, +1}
    (``logdet_matmul``), for which the ratio's sign is the sign PRODUCT —
    treating the sign as an angle silently maps a sign flip to
    cos(+-2) = -0.416 instead of -1 and biases every psi-ratio estimator
    (nonlocal ECP energy, T-moves, one-RDM) wherever the displaced
    configuration crosses a node.
    """
    mag_ratio = jnp.exp(dmag)
    if complex_output:
        d = phase_new - phase_old
        return mag_ratio * jnp.cos(d), mag_ratio * jnp.sin(d)
    return mag_ratio * phase_new * phase_old, jnp.zeros_like(mag_ratio)


def logdet_matmul(xs: Sequence[jnp.ndarray],
                  w: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Combines determinants in the log domain (ref network_blocks.py:161-206).

    Returns (phase, log|sum_i w_i D_i|) where the phase is an angle for complex
    determinants and a sign otherwise.
    """
    det1d = functools.reduce(
        lambda a, b: a * b, [x.reshape(-1) for x in xs if x.shape[-1] == 1], 1)
    phase_in, logdet = functools.reduce(
        lambda a, b: (a[0] * b[0], a[1] + b[1]),
        [slogdet(x) for x in xs if x.shape[-1] > 1], (1, 0))

    # Same -inf floor as logdet_matmul_pair: psi = 0 -> log_out = -inf,
    # never exp(-inf + inf) = NaN. (logdet is the python int 0 when every
    # block is 1x1 — promote to float before flooring.)
    logdet = jnp.asarray(logdet, jnp.result_type(logdet, jnp.float32))
    maxlogdet = jnp.maximum(jnp.max(logdet),
                            jnp.asarray(-1e30, logdet.dtype))
    det = phase_in * det1d * jnp.exp(logdet - maxlogdet)
    if w is None:
        result = jnp.sum(det)
    else:
        result = jnp.matmul(det, w)[0]
    if jnp.iscomplexobj(result):
        phase_out = jnp.angle(result)
    else:
        phase_out = jnp.sign(result)
    log_out = jnp.log(jnp.abs(result)) + maxlogdet
    return phase_out, log_out


def logdet_matmul_pair(xs: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
                       w: Optional[jnp.ndarray] = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``logdet_matmul`` for complex determinant matrices carried as (re, im)
    real pairs — the TPU path for complex orbitals (ref nn.py:456,
    network_blocks.py:161-206; this backend has no complex64).

    Returns (phase angle, log|sum_i D_i|), matching the complex
    ``logdet_matmul`` output up to the sign-vs-angle convention (always an
    angle here).
    """
    from aiqmc_tpu.ops import slogdet as fast_slogdet

    # 1x1 determinants multiply in as complex scalars.
    det1_r, det1_i = None, None
    for xr, xi in xs:
        if xr.shape[-1] == 1:
            r, i = xr.reshape(-1), xi.reshape(-1)
            if det1_r is None:
                det1_r, det1_i = r, i
            else:
                det1_r, det1_i = det1_r * r - det1_i * i, det1_r * i + det1_i * r
    # Identity init (cos=1, sin=0, logdet=0) keeps this correct when every
    # block is 1x1 (single-electron-per-spin systems): the >1x1 loop then
    # contributes nothing and det1_{r,i} alone carries the determinant, like
    # logdet_matmul's reduce with identity init.
    cos, sin, logdet = 1.0, 0.0, 0.0
    for xr, xi in xs:
        if xr.shape[-1] > 1:
            c, s, ld = fast_slogdet.slogdet_pair(xr, xi)
            cos, sin, logdet = cos * c - sin * s, cos * s + sin * c, logdet + ld
    # Floor the max: with EVERY det underflowed to log 0 = -inf the naive
    # max-subtraction yields exp(-inf + inf) = NaN; the floor turns psi = 0
    # into the correct log_out = -inf instead.
    maxlogdet = jnp.maximum(jnp.max(jnp.asarray(logdet)),
                            jnp.asarray(-1e30, dtype=jnp.asarray(logdet).dtype))
    scale = jnp.exp(logdet - maxlogdet)
    det_r, det_i = cos * scale, sin * scale
    if det1_r is not None:
        det_r, det_i = det_r * det1_r - det_i * det1_i, det_r * det1_i + det_i * det1_r
    if w is None:
        res_r, res_i = jnp.sum(det_r), jnp.sum(det_i)
    else:
        res_r, res_i = jnp.matmul(det_r, w)[0], jnp.matmul(det_i, w)[0]
    phase_out = jnp.arctan2(res_i, res_r)
    log_out = 0.5 * jnp.log(res_r * res_r + res_i * res_i) + maxlogdet
    return phase_out, log_out
