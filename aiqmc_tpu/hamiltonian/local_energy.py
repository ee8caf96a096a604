"""All-electron local energy (ref AIQMCrelease3/Energy/hamiltonian.py:236-260)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import chex
import jax.numpy as jnp

from aiqmc_tpu.hamiltonian import coulomb
from aiqmc_tpu.hamiltonian.kinetic import local_kinetic_energy
from aiqmc_tpu.models.features import construct_input_features


def local_energy(f,
                 charges: jnp.ndarray,
                 nspins: Sequence[int],
                 use_scan: bool = False,
                 complex_output: bool = False,
                 laplacian_chunk: Optional[int] = None):
    """Builds e_l(params, key, data) -> (E_L, energy_mat) for molecules."""
    del nspins
    ke = local_kinetic_energy(f, use_scan=use_scan, complex_output=complex_output,
                              laplacian_chunk=laplacian_chunk)

    def _e_l(params, key: chex.PRNGKey, data) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        del key
        _, _, r_ae, r_ee = construct_input_features(data.positions, data.atoms)
        potential = coulomb.potential_energy(r_ae, r_ee, data.atoms, charges)
        kinetic = ke(params, data)
        return potential + kinetic, None

    return _e_l
