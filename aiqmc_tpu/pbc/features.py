"""Periodic input features: sin/cos phase coordinates + periodic norm.

Capability parity with ref ``ferminet/pbc/feature_layer.py:29-110`` (the AIQMC
tree's g-vector variant, PBC/PBCenvelope.py:52-100, expands displacements over a
g-grid; the sin/cos parameterisation spans the same function space with a fixed
feature count and no grid hyperparameter). Lattice rows are primitive vectors.
"""

from __future__ import annotations

from typing import Mapping, Optional, Tuple

import jax.numpy as jnp

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
