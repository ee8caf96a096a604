"""Periodic pseudopotential local energy: Ewald + ccECP under PBC.

The reference has no pp+PBC combination (its PBC set is all-electron WIP,
ref PBC/twoDEwald.py; its ECP path is molecular, ref Energy/pphamiltonian.py).
This module composes the two validated pieces the solid-state-QMC way:

    E_L = T + Ewald(valence charges Z_eff)                      [long range]
        + sum_{i,a} [V_loc^ECP(r_ia) + Z_eff/r_ia]              [short range]
        + V_nonlocal(minimum image)                             [short range]

The Ewald sum (pbc/ewald.py, Madelung-validated) carries every periodic
Coulomb piece with the effective valence charges; what remains of the ECP
local channel is the Gaussian correction sum_k c_k r^(n-2) exp(-a r^2), which
decays within ~1 bohr for ccECPs — evaluated at the nearest image only
(hamiltonian/ecp.py local_pp_energy(coulomb=False, lattice=...)). The nonlocal
projector acts about each atom's nearest image with the same fused quadrature
as the molecular path.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import chex
import jax.numpy as jnp

from aiqmc_tpu.hamiltonian import ecp
from aiqmc_tpu.hamiltonian.kinetic import make_kinetic
from aiqmc_tpu.models.features import construct_input_features
from aiqmc_tpu.pbc import ewald as ewald_lib


def local_energy(f,
                 charges: jnp.ndarray,
                 nspins: Sequence[int],
                 lattice: jnp.ndarray,
                 rn_local: jnp.ndarray,
                 local_coes: jnp.ndarray,
                 local_exps: jnp.ndarray,
                 rn_non_local: jnp.ndarray,
                 non_local_coes: jnp.ndarray,
                 non_local_exps: jnp.ndarray,
                 natoms: int,
                 nelectrons: int,
                 ndim: int = 3,
                 list_l: int = 2,
                 complex_output: bool = False,
                 convergence_radius: int = 5,
                 laplacian_chunk: Optional[int] = None,
                 laplacian_method: str = "default",
                 orbitals_fn=None,
                 pair_output: bool = False,
                 twist_k=None,
                 quadrature: str = "icosahedral12"):
    """Builds e_l(params, key, data) for a periodic pseudopotential system.

    ``charges`` are the VALENCE (Z_eff) charges, which enter both the Ewald
    sum and the nonlocal tables.
    """
    del nspins
    lattice = jnp.asarray(lattice)
    ke = make_kinetic(f, laplacian_method=laplacian_method,
                      orbitals_fn=orbitals_fn, complex_output=complex_output,
                      pair_output=pair_output, twist_k=twist_k, ndim=ndim,
                      laplacian_chunk=laplacian_chunk)

    # Short-range ECP local correction (no Coulomb term: Ewald carries it).
    sr_local = ecp.local_pp_energy(
        nelectrons, natoms, ndim, rn_local, local_coes, local_exps,
        lattice=lattice, coulomb=False)
    nonlocal_fn = ecp.make_nonlocal_pp_energy(
        f, nelectrons, natoms, ndim, list_l, rn_non_local, non_local_coes,
        non_local_exps, complex_output=complex_output,
        pair_output=pair_output, quadrature=quadrature, lattice=lattice)

    def _e_l(params, key: chex.PRNGKey, data
             ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        potential_fn = ewald_lib.make_ewald_potential(
            lattice, data.atoms, charges, convergence_radius,
            include_heg_background=False)
        ae, ee, _, _ = construct_input_features(data.positions, data.atoms)
        coulomb = potential_fn(ae, ee)
        short_range = jnp.sum(sr_local(data))
        nl = nonlocal_fn(params, key, data)
        kinetic = ke(params, data)
        real_part = coulomb + short_range
        if complex_output and pair_output:
            return (kinetic + nl
                    + jnp.stack([real_part, jnp.zeros_like(real_part)])), None
        return kinetic + real_part + nl, None

    return _e_l
