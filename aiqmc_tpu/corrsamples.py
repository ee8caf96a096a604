"""Space-warp coordinate-transform (SWCT) correlated samples.

Capability parity with ref ``AIQMCrelease3/correlatedsamples/corrsamples.py:23-47``
and ``jacobianWeights.py:22-51``: transport electrons with a displaced geometry
using omega(r) = r_ae^-4 normalised weights, and weight correlated energies by
the transform Jacobian x |psi_new/psi_old|^2.

The Jacobian here is computed exactly with ``jax.jacfwd`` of the warp (a 3N x 3N
determinant of an analytic map) rather than the reference's hand-derived
per-axis product approximation (jacobianWeights.py:29-49).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aiqmc_tpu.models.features import construct_input_features


def correlated_samples(atoms: jnp.ndarray, new_atoms: jnp.ndarray,
                       pos: jnp.ndarray) -> jnp.ndarray:
    """Warps one electron configuration to the displaced geometry.

    new_r_i = r_i + sum_a omega_ia * (R'_a - R_a),
    omega_ia = r_ia^-4 / sum_b r_ib^-4   (ref corrsamples.py:23-47).
    """
    delta_r = new_atoms - atoms
    _, _, r_ae, _ = construct_input_features(pos, atoms, ndim=3)
    k = 1.0 / (r_ae[..., 0] ** 4)  # (nelec, natoms)
    omega = k / jnp.sum(k, axis=-1, keepdims=True)
    move = jnp.einsum("ia,ad->id", omega, delta_r)
    return pos + move.reshape(-1)


def weights_jacobian(pos: jnp.ndarray, atoms: jnp.ndarray,
                     new_atoms: jnp.ndarray) -> jnp.ndarray:
    """|det d(warped pos)/d(pos)|, the SWCT volume element."""
    jac = jax.jacfwd(lambda x: correlated_samples(atoms, new_atoms, x))(pos)
    return jnp.abs(jnp.linalg.det(jac))


def make_correlated_quantities(signed_network, local_energy):
    """Returns fn(params, key, data, new_atoms) -> (per-walker E_new, raw SWCT
    weights jac * |psi_new/psi_old|^2), for composition with arbitrary walker
    weights (VMC uniform or DMC population weights)."""

    def correlated_quantities(params, key, data, new_atoms):
        def one_walker(pos, subkey):
            new_pos = correlated_samples(data.atoms, new_atoms, pos)
            jac = weights_jacobian(pos, data.atoms, new_atoms)
            _, log_old = signed_network(params, pos, data.spins, data.atoms,
                                        data.charges)
            _, log_new = signed_network(params, new_pos, data.spins, new_atoms,
                                        data.charges)
            ratio = jnp.exp(2.0 * (log_new - log_old))
            new_data = dict(data) | {"positions": new_pos, "atoms": new_atoms}
            from aiqmc_tpu.models.network import AINetData
            e_new, _ = local_energy(params, subkey, AINetData(**new_data))
            return e_new, jac * ratio

        keys = jax.random.split(key, num=data.positions.shape[0])
        return jax.vmap(one_walker)(data.positions, keys)

    return correlated_quantities


def make_correlated_energy(signed_network, local_energy):
    """Returns fn(params, key, data, new_atoms) -> (E_new, weights) evaluating
    the energy at a displaced geometry from reference-geometry samples
    (ref VMC/VMC_energy_correlated_samples.py:156-189)."""
    quantities = make_correlated_quantities(signed_network, local_energy)

    def correlated_energy(params, key, data, new_atoms):
        e_new, w = quantities(params, key, data, new_atoms)
        w = w / jnp.sum(w)
        return jnp.sum(e_new * w), w

    return correlated_energy
