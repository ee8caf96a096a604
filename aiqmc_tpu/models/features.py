"""Input feature construction for the wavefunction.

Parity with ref ``AIQMCrelease3/wavefunction_Ynlm/nn.py:106-139``: electron-atom and
electron-electron displacement vectors and (diagonal-safe) distances, concatenated
into per-electron / per-pair feature tensors with an optional log rescale.
"""

from __future__ import annotations

from typing import Mapping, Tuple

import jax.numpy as jnp


def construct_input_features(
    pos: jnp.ndarray,
    atoms: jnp.ndarray,
    ndim: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (ae, ee, r_ae, r_ee) for a single electron configuration.

    ae: (nelec, natoms, ndim) electron-atom displacements.
    ee: (nelec, nelec, ndim) electron-electron displacements.
    r_ae: (nelec, natoms, 1) distances.
    r_ee: (nelec, nelec, 1) distances, exactly zero on the diagonal but computed
      through a norm whose argument is offset by the identity so its gradient is
      finite there (ref nn.py:114-115).
    """
    assert atoms.shape[1] == ndim
    ae = jnp.reshape(pos, [-1, 1, ndim]) - atoms[None, ...]
    ee = jnp.reshape(pos, [1, -1, ndim]) - jnp.reshape(pos, [-1, 1, ndim])
    r_ae = jnp.linalg.norm(ae, axis=2, keepdims=True)
    n = ee.shape[0]
    r_ee = jnp.linalg.norm(ee + jnp.eye(n)[..., None], axis=-1) * (1.0 - jnp.eye(n))
    return ae, ee, r_ae, r_ee[..., None]


class FeatureLayer:
    """Init/apply pair producing the raw ae/ee feature tensors (ref nn.py:119-139)."""

    def __init__(self, natoms: int, ndim: int = 3, rescale_inputs: bool = False):
        self._natoms = natoms
        self._ndim = ndim
        self._rescale = rescale_inputs

    def init(self) -> Tuple[Tuple[int, int], Mapping]:
        return (self._natoms * (self._ndim + 1), self._ndim + 1), {}

    def apply(self, ae, r_ae, ee, r_ee) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self._rescale:
            log_r_ae = jnp.log(1 + r_ae)
            ae_features = jnp.concatenate((log_r_ae, ae * log_r_ae / r_ae), axis=2)
            log_r_ee = jnp.log(1 + r_ee)
            ee_features = jnp.concatenate((log_r_ee, ee * log_r_ee / r_ee), axis=2)
        else:
            ae_features = jnp.concatenate((r_ae, ae), axis=2)
            ee_features = jnp.concatenate((r_ee, ee), axis=2)
        ae_features = jnp.reshape(ae_features, [ae_features.shape[0], -1])
        return ae_features, ee_features


def make_ainet_features(natoms: int, ndim: int = 3,
                        rescale_inputs: bool = False) -> FeatureLayer:
    return FeatureLayer(natoms=natoms, ndim=ndim, rescale_inputs=rescale_inputs)
