"""VMC evaluation drivers: plain energy evaluation and SWCT correlated samples.

Capability parity with ref ``AIQMCrelease3/VMC/VMC_energy_correlated_samples.py``
(:30-194): restore a checkpoint, equilibrate walkers, evaluate the energy at the
reference geometry and at displaced geometries using space-warp-transported
samples with Jacobian x |psi_new/psi_old|^2 weights.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from absl import logging

from aiqmc_tpu import corrsamples
from aiqmc_tpu.models.network import AINetData


def evaluate_energy(local_energy, params, key, data: AINetData
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-mean energy and per-walker energies."""
    batch_local_energy = jax.vmap(
        local_energy,
        in_axes=(None, 0, AINetData(positions=0, spins=None, atoms=None,
                                    charges=None)))
    keys = jax.random.split(key, num=data.positions.shape[0])
    e_l, _ = batch_local_energy(params, keys, data)
    return jnp.mean(e_l), e_l


def correlated_energy_sweep(signed_network,
                            make_local_energy,
                            params,
                            key,
                            data: AINetData,
                            new_atoms_list: Sequence[jnp.ndarray]):
    """Energies at displaced geometries from reference-geometry walkers.

    make_local_energy(atoms) must build the local-energy function for a
    geometry (the ECP/Coulomb tables depend only on charges, which are fixed).
    Returns (E_ref, [E_displaced...]) (ref VMC_energy_correlated_samples.py:156-189).
    """
    ref_local_energy = make_local_energy(data.atoms)
    key, subkey = jax.random.split(key)
    e_ref, _ = evaluate_energy(ref_local_energy, params, subkey, data)

    energies = []
    for new_atoms in new_atoms_list:
        new_atoms = jnp.asarray(new_atoms)
        corr = corrsamples.make_correlated_energy(
            signed_network, make_local_energy(new_atoms))
        key, subkey = jax.random.split(key)
        e_new, _ = corr(params, subkey, data, new_atoms)
        energies.append(e_new)
        logging.info("Correlated-sample energy at displaced geometry: %s",
                     np.asarray(e_new))
    return e_ref, energies
