"""Pseudopotential local energy (ref AIQMCrelease3/Energy/pphamiltonian.py).

E_L = T + V_ee + V_nn + V_ECP-local + V_ECP-nonlocal, with the electron-nuclear
Coulomb term replaced by the ECP channels (ref pphamiltonian.py:109-190).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import chex
import jax.numpy as jnp

from aiqmc_tpu.hamiltonian import coulomb, ecp
from aiqmc_tpu.hamiltonian.kinetic import make_kinetic
from aiqmc_tpu.models.features import construct_input_features


def local_energy(f,
                 lognetwork,
                 charges: jnp.ndarray,
                 nspins: Sequence[int],
                 rn_local: jnp.ndarray,
                 local_coes: jnp.ndarray,
                 local_exps: jnp.ndarray,
                 rn_non_local: jnp.ndarray,
                 non_local_coes: jnp.ndarray,
                 non_local_exps: jnp.ndarray,
                 natoms: int,
                 nelectrons: int,
                 ndim: int,
                 list_l: int,
                 use_scan: bool = False,
                 complex_output: bool = False,
                 laplacian_chunk: Optional[int] = None,
                 reference_compat: bool = False,
                 laplacian_method: str = "default",
                 orbitals_fn=None,
                 pair_output: bool = False,
                 twist_k=None,
                 quadrature: str = "msc50"):
    """Builds e_l(params, key, data) for ccECP systems (ref pphamiltonian.py:130-190).

    ``lognetwork`` is accepted for reference API parity but the psi-ratio path
    uses the signed network ``f`` directly (TPU-safe real/imag arithmetic).
    """
    del nspins, lognetwork
    ke = make_kinetic(f, laplacian_method=laplacian_method,
                      orbitals_fn=orbitals_fn, complex_output=complex_output,
                      pair_output=pair_output, twist_k=twist_k, ndim=ndim,
                      use_scan=use_scan, laplacian_chunk=laplacian_chunk)
    get_local = ecp.local_pp_energy(
        nelectrons=nelectrons, natoms=natoms, ndim=ndim, rn_local=rn_local,
        local_coefficient=local_coes, local_exponent=local_exps)
    nonlocal_energy = ecp.make_nonlocal_pp_energy(
        signed_network=f, nelectrons=nelectrons, natoms=natoms, ndim=ndim,
        list_l=list_l, rn_non_local=rn_non_local,
        non_local_coefficient=non_local_coes, non_local_exponent=non_local_exps,
        complex_output=complex_output, reference_compat=reference_compat,
        pair_output=pair_output, quadrature=quadrature)

    def _e_l(params, key: chex.PRNGKey, data
             ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        _, _, _, r_ee = construct_input_features(data.positions, data.atoms)
        potential = (coulomb.potential_electron_electron(r_ee) +
                     coulomb.potential_nuclear_nuclear(charges, data.atoms))
        kinetic = ke(params, data)
        pp_local = jnp.sum(get_local(data))
        pp_nonlocal = nonlocal_energy(params, key, data)
        if complex_output and pair_output:
            real = potential + pp_local
            return (kinetic + pp_nonlocal
                    + jnp.stack([real, jnp.zeros_like(real)])), None
        return potential + kinetic + pp_local + pp_nonlocal, None

    return _e_l
