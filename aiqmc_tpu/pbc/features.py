"""Periodic input features: sin/cos phase coordinates + periodic norm.

Capability parity with ref ``ferminet/pbc/feature_layer.py:29-110`` (the AIQMC
tree's g-vector variant, PBC/PBCenvelope.py:52-100, expands displacements over a
g-grid; the sin/cos parameterisation spans the same function space with a fixed
feature count and no grid hyperparameter). Lattice rows are primitive vectors.
"""

from __future__ import annotations

from typing import Mapping, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.models.features import FeatureLayer


def periodic_norm(metric: jnp.ndarray, scaled_r: jnp.ndarray) -> jnp.ndarray:
    """Smooth periodic generalisation of |r| on fractional coordinates."""
    a = 1 - jnp.cos(2 * jnp.pi * scaled_r)
    b = jnp.sin(2 * jnp.pi * scaled_r)
    cos_term = jnp.einsum("...m,mn,...n->...", a, metric, a)
    sin_term = jnp.einsum("...m,mn,...n->...", b, metric, b)
    return (1 / (2 * jnp.pi)) * jnp.sqrt(cos_term + sin_term)


class PbcFeatureLayer(FeatureLayer):
    """Drop-in periodic replacement for the molecular FeatureLayer."""

    def __init__(self, natoms: int, ndim: int = 3, rescale_inputs: bool = False,
                 lattice: Optional[jnp.ndarray] = None,
                 include_r_ae: bool = True):
        super().__init__(natoms, ndim, rescale_inputs)
        self._lattice = jnp.eye(ndim) if lattice is None else jnp.asarray(lattice)
        # Rows are lattice vectors: fractional coords are x @ inv(L).
        self._inv_lattice = jnp.linalg.inv(self._lattice)
        self._metric = self._lattice @ self._lattice.T
        self._include_r_ae = include_r_ae

    def init(self) -> Tuple[Tuple[int, int], Mapping]:
        per_atom = 2 * self._ndim + (1 if self._include_r_ae else 0)
        return (self._natoms * per_atom, 2 * self._ndim + 1), {}

    def apply(self, ae, r_ae, ee, r_ee) -> Tuple[jnp.ndarray, jnp.ndarray]:
        del r_ae, r_ee  # recomputed periodically
        s_ae = ae @ self._inv_lattice
        s_ee = ee @ self._inv_lattice
        ae_f = jnp.concatenate(
            (jnp.sin(2 * jnp.pi * s_ae), jnp.cos(2 * jnp.pi * s_ae)), axis=-1)
        ee_f = jnp.concatenate(
            (jnp.sin(2 * jnp.pi * s_ee), jnp.cos(2 * jnp.pi * s_ee)), axis=-1)
        pr_ae = periodic_norm(self._metric, s_ae)
        if self._rescale:
            pr_ae = jnp.log(1 + pr_ae)
        n = ee_f.shape[0]
        s_ee = s_ee + jnp.eye(n)[..., None]
        pr_ee = periodic_norm(self._metric, s_ee) * (1.0 - jnp.eye(n))
        if self._include_r_ae:
            ae_f = jnp.concatenate((pr_ae[..., None], ae_f), axis=2)
        ae_f = jnp.reshape(ae_f, [ae_f.shape[0], -1])
        ee_f = jnp.concatenate((pr_ee[..., None], ee_f), axis=2)
        return ae_f, ee_f


def make_pbc_feature_layer(natoms: int, ndim: int = 3,
                           rescale_inputs: bool = False,
                           lattice: Optional[jnp.ndarray] = None,
                           include_r_ae: bool = True) -> PbcFeatureLayer:
    return PbcFeatureLayer(natoms, ndim, rescale_inputs, lattice, include_r_ae)


class GvectorFeatureLayer(FeatureLayer):
    """Lattice-image expansion features (the AIQMC tree's own PBC variant).

    Reference parity: ``AIQMCrelease3/PBC/PBCenvelope.py:52-100`` /
    ``PBC/nnPBC.py:104`` feed, for every displacement, the stack of displaced
    copies ``d + G`` over a grid of lattice vectors G together with their
    norms — the raw g-vector alternative to the sin/cos parameterisation
    above. Two deliberate departures from the reference, both documented
    behaviour fixes rather than omissions:

    * displacements are mapped into the fundamental cell BEFORE the image
      expansion, which makes the features exactly invariant under lattice
      translations of any particle — the reference's unwrapped stack loses
      invariance at the grid boundary. Two maps are offered:
      ``smooth=True`` (default) uses the C-inf periodic surrogate
      ``sin(2 pi s) @ L / (2 pi)`` (the same map as the network's
      ``pbc_smooth_r``), so every per-image feature is BOTH periodic and
      continuous everywhere — in particular across the half-cell boundary;
      ``smooth=False`` uses the minimum-image wrap (fractional parts in
      [-1/2, 1/2)), which keeps the exact Euclidean image geometry but is
      DISCONTINUOUS when a fractional coordinate crosses +-1/2 (the wrapped
      vector jumps by a lattice vector and per-slot features permute/change
      — log|psi| is then discontinuous at the boundary; biased E_L there).
      The minimum-image variant is retained only as the reference-geometry
      ablation; production periodic runs should keep ``smooth=True`` or use
      the sin/cos layer above;
    * the image grid is the full symmetric ``[-g_max, g_max]^ndim`` cube
      (the reference hard-codes an asymmetric 2-D ``mgrid[-g:g, -g:g, 0:1]``
      slice, a WIP artefact of its 2-D Ewald experiments).

    One matmul-shaped tensor per feature block (images folded into the
    feature axis) keeps the XLA program identical in structure to the
    molecular layer — just a wider feature dimension.
    """

    def __init__(self, natoms: int, ndim: int = 3, rescale_inputs: bool = False,
                 lattice: Optional[jnp.ndarray] = None, g_max: int = 1,
                 smooth: bool = True):
        super().__init__(natoms, ndim, rescale_inputs)
        self._smooth = smooth
        self._lattice = jnp.eye(ndim) if lattice is None else jnp.asarray(lattice)
        self._inv_lattice = jnp.linalg.inv(self._lattice)
        grid = np.stack(np.meshgrid(
            *([np.arange(-g_max, g_max + 1)] * ndim), indexing="ij"),
            axis=-1).reshape(-1, ndim)
        # Rows of the lattice are primitive vectors: G = n @ L.
        self._gvectors = jnp.asarray(grid, dtype=self._lattice.dtype) @ self._lattice
        self._n_images = grid.shape[0]

    def init(self) -> Tuple[Tuple[int, int], Mapping]:
        per_image = self._ndim + 1
        return (self._natoms * self._n_images * per_image,
                self._n_images * per_image), {}

    def _expand(self, disp: jnp.ndarray, mask_diag: bool) -> jnp.ndarray:
        """(…, ndim) displacements -> (…, n_images*(ndim+1)) image features."""
        frac = disp @ self._inv_lattice
        if self._smooth:
            # C-inf periodic surrogate: periodic by construction (every slot
            # feature is a smooth periodic function of the fractional
            # coordinate), matches the Euclidean displacement to O(r^3) at
            # coincidence so the e-e/e-a cusp inputs are preserved.
            base = jnp.sin(2 * jnp.pi * frac) @ self._lattice / (2 * jnp.pi)
        else:
            # Minimum-image wrap: exact image geometry, discontinuous at the
            # half-cell boundary (see class docstring).
            base = (frac - jnp.round(frac)) @ self._lattice
        imgs = base[..., None, :] + self._gvectors  # (..., n_images, ndim)
        if mask_diag:
            # Gradient-safe zero diagonal (same convention as the molecular
            # r_ee, ref nn.py:114-115): offset the norm argument so the
            # derivative is finite at coincidence, zero the features after.
            n = disp.shape[0]
            eye = jnp.eye(n)
            r = jnp.linalg.norm(imgs + eye[..., None, None], axis=-1)
            feats = jnp.concatenate((r[..., None], imgs), axis=-1)
            feats = feats * (1.0 - eye)[..., None, None]
        else:
            r = jnp.linalg.norm(imgs, axis=-1)
            feats = jnp.concatenate((r[..., None], imgs), axis=-1)
        if self._rescale:
            r_safe = jnp.where(feats[..., :1] == 0.0, 1.0, r[..., None])
            feats = feats * jnp.log(1 + r[..., None]) / r_safe
        return jnp.reshape(feats, feats.shape[:-2] + (-1,))

    def apply(self, ae, r_ae, ee, r_ee) -> Tuple[jnp.ndarray, jnp.ndarray]:
        del r_ae, r_ee  # recomputed per image
        ae_f = self._expand(ae, mask_diag=False)
        ee_f = self._expand(ee, mask_diag=True)
        ae_f = jnp.reshape(ae_f, [ae_f.shape[0], -1])
        return ae_f, ee_f


def make_gvector_feature_layer(natoms: int, ndim: int = 3,
                               rescale_inputs: bool = False,
                               lattice: Optional[jnp.ndarray] = None,
                               g_max: int = 1,
                               smooth: bool = True) -> GvectorFeatureLayer:
    return GvectorFeatureLayer(natoms, ndim, rescale_inputs, lattice, g_max,
                               smooth)
