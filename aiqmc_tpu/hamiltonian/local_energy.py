"""All-electron local energy (ref AIQMCrelease3/Energy/hamiltonian.py:236-260)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import chex
import jax.numpy as jnp

from aiqmc_tpu.hamiltonian import coulomb
from aiqmc_tpu.hamiltonian.kinetic import make_kinetic
from aiqmc_tpu.models.features import construct_input_features


def local_energy(f,
                 charges: jnp.ndarray,
                 nspins: Sequence[int],
                 use_scan: bool = False,
                 complex_output: bool = False,
                 laplacian_chunk: Optional[int] = None,
                 laplacian_method: str = "default",
                 orbitals_fn=None,
                 pair_output: bool = False,
                 twist_k=None,
                 ndim: int = 3):
    """Builds e_l(params, key, data) -> (E_L, energy_mat) for molecules.

    laplacian_method: 'default' (batched forward-over-reverse tangents) or
    'forward' (one-pass forward Laplacian, ops/forward_laplacian.py; requires
    orbitals_fn and either a real wavefunction or the pair-complex
    representation; ~2x fewer FLOPs).
    pair_output: with complex_output, E_L is returned as a stacked real pair
    [Re, Im] (TPU-safe; no complex dtype).
    twist_k: optional Cartesian twist wavevector folded into the forward
    pair kinetic analytically (pbc/twist.apply_twist wraps ``f`` only).
    """
    del nspins
    ke = make_kinetic(f, laplacian_method=laplacian_method,
                      orbitals_fn=orbitals_fn, complex_output=complex_output,
                      pair_output=pair_output, twist_k=twist_k, ndim=ndim,
                      use_scan=use_scan, laplacian_chunk=laplacian_chunk)

    def _e_l(params, key: chex.PRNGKey, data) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        del key
        _, _, r_ae, r_ee = construct_input_features(data.positions, data.atoms)
        potential = coulomb.potential_energy(r_ae, r_ee, data.atoms, charges)
        kinetic = ke(params, data)
        if complex_output and pair_output:
            return kinetic + jnp.stack([potential, jnp.zeros_like(potential)]), None
        return potential + kinetic, None

    return _e_l
