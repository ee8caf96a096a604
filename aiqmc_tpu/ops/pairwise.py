"""Fused pairwise displacement/distance features (Pallas kernel + fallback).

The feature construction (ref AIQMCrelease3/wavefunction_Ynlm/nn.py:106-139) is
re-entered O(3N) times in the Laplacian and O(50 * nelec * natoms) times in the
nonlocal-ECP quadrature; it is bandwidth-bound elementwise work. This kernel
fuses the electron-electron displacement, diagonal-safe distance and feature
concatenation for a whole walker batch in one VMEM pass. The pure-JAX fallback
is mathematically identical (XLA fuses it well too — the kernel mainly avoids
intermediate HBM round-trips for large batches).

Use ``ee_features_batch(pos_batch, use_pallas=...)``.

Status: the kernel is exact in Pallas interpret mode (tested), but the current
Mosaic TPU lowering rejects the minor-dimension reshapes it uses ("unsupported
shape cast"), so ``use_pallas`` stays False by default and the fused pure-JAX
path (which XLA fuses into the surrounding computation anyway) is used on
hardware. A Mosaic-friendly relayout is queued behind the forward-Laplacian
kernel work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
try:  # TPU-specific namespace; absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def ee_features_single(pos: jnp.ndarray, nelec: int) -> jnp.ndarray:
    """Pure-JAX reference: (nelec, nelec, 4) [r_ee, ee] features."""
    x = pos.reshape(nelec, 3)
    ee = x[None, :, :] - x[:, None, :]
    eye = jnp.eye(nelec)
    r_ee = jnp.linalg.norm(ee + eye[..., None], axis=-1) * (1.0 - eye)
    return jnp.concatenate([r_ee[..., None], ee], axis=-1)


# Walkers per kernel invocation: the TPU lowering needs the sublane (second to
# last) block dimension to be a multiple of 8.
BLOCK_WALKERS = 8


def _kernel(pos_ref, out_ref, *, nelec: int):
    """One BLOCK_WALKERS tile: compute (B, nelec, nelec*4) features in VMEM."""
    x = pos_ref[...].reshape(BLOCK_WALKERS, nelec, 3)
    ee = x[:, None, :, :] - x[:, :, None, :]
    eye = jnp.eye(nelec, dtype=x.dtype)
    shifted = ee + eye[None, ..., None]
    r = jnp.sqrt(jnp.sum(shifted * shifted, axis=-1)) * (1.0 - eye)[None]
    out = jnp.concatenate([r[..., None], ee], axis=-1)
    out_ref[...] = out.reshape(BLOCK_WALKERS, nelec, nelec * 4)


def ee_features_batch(pos_batch: jnp.ndarray, nelec: int,
                      use_pallas: bool = False,
                      interpret: bool = False) -> jnp.ndarray:
    """(batch, nelec*3) -> (batch, nelec, nelec, 4) fused features."""
    if (not use_pallas or not _HAS_PLTPU
            or pos_batch.shape[0] % BLOCK_WALKERS != 0):
        return jax.vmap(lambda p: ee_features_single(p, nelec))(pos_batch)
    batch = pos_batch.shape[0]
    kernel = functools.partial(_kernel, nelec=nelec)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, nelec, nelec * 4),
                                       pos_batch.dtype),
        grid=(batch // BLOCK_WALKERS,),
        in_specs=[pl.BlockSpec((BLOCK_WALKERS, nelec * 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLOCK_WALKERS, nelec, nelec * 4),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pos_batch)
    return out.reshape(batch, nelec, nelec, 4)
