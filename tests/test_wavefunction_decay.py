"""Normalisability regression test.

The reference envelope's summed per-component exponentials leave log|psi| FLAT
at large distance along coordinate planes (non-normalisable |psi|^2, walkers
diffuse to infinity, E -> 0). The bounded envelope must decay in every
direction.
"""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.models import network as nn, spin_indices


def _net(bounded):
    spins = np.array([1.0, -1.0])
    atoms = jnp.zeros((1, 3))
    charges = jnp.array([2.0])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, 2)
    up, down = spin_indices.spin_indices_h(spins)
    net = nn.make_ai_net(
        nspins=(1, 1), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=1,
        nelectrons=2, full_equivariance=True, complex_orbitals=False,
        bounded_envelope=bounded, regular_harmonics=True,
        hidden_dims=((16, 8), (16, 8)), hidden_dims_Ynlm=(8, 8))
    return net, jnp.asarray(spins), atoms, charges


def test_bounded_envelope_psi_decays_everywhere():
    net, spins, atoms, charges = _net(bounded=True)
    params = net.init(jax.random.PRNGKey(1))
    directions = [
        np.array([1.0, 0, 0]),               # coordinate axis
        np.array([0, 1.0, 1.0]) / np.sqrt(2),  # coordinate plane
        np.array([1.0, 1.0, 1.0]) / np.sqrt(3),
    ]
    for d in directions:
        logs = []
        for r in (3.0, 8.0, 16.0):
            pos = jnp.concatenate([r * jnp.asarray(d), -r * jnp.asarray(d)])
            _, lg = net.apply(params, pos, spins, atoms, charges)
            logs.append(float(lg))
        # must decay by at least ~1 per bohr between the radii
        assert logs[1] < logs[0] - 4.0, (d, logs)
        assert logs[2] < logs[1] - 4.0, (d, logs)
