"""DMC with SWCT correlated samples.

Capability parity with ref ``AIQMCrelease3/DMC/main_dmc_correlated_samples.py``:
run the DMC propagation at the reference geometry while accumulating
correlated-sample energies at displaced geometries via the space-warp transform
(Jacobian x |psi_new/psi_old|^2 weights on the DMC walker population).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from aiqmc_tpu import corrsamples
from aiqmc_tpu.models.network import AINetData


def make_correlated_dmc_accumulator(signed_network,
                                    make_local_energy,
                                    new_atoms_list: Sequence[jnp.ndarray]):
    """Returns accumulate(params, key, data, weights) -> (E_ref_weighted,
    [E_displaced_weighted...]) evaluating DMC-weighted correlated energies.

    ``make_local_energy(atoms)`` builds the geometry-specific local energy.
    DMC weights multiply the SWCT weights so the estimator matches the mixed
    DMC distribution (ref main_dmc_correlated_samples.py).
    """
    quantity_fns = [(jnp.asarray(a), corrsamples.make_correlated_quantities(
        signed_network, make_local_energy(jnp.asarray(a))))
        for a in new_atoms_list]

    @jax.jit
    def accumulate(params, key, data: AINetData, weights: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, list]:
        ref_le = make_local_energy(data.atoms)
        keys = jax.random.split(key, num=data.positions.shape[0])
        batch_le = jax.vmap(
            ref_le, in_axes=(None, 0, AINetData(positions=0, spins=None,
                                                atoms=None, charges=None)))
        e_ref, _ = batch_le(params, keys, data)
        w = weights / jnp.sum(weights)
        e_ref_weighted = jnp.sum(e_ref.real * w)

        displaced = []
        for new_atoms, quantities in quantity_fns:
            key, subkey = jax.random.split(key)
            e_new, swct_w = quantities(params, subkey, data, new_atoms)
            combined = swct_w * weights
            combined = combined / jnp.sum(combined)
            displaced.append(jnp.sum(e_new.real * combined))
        return e_ref_weighted, displaced

    return accumulate
