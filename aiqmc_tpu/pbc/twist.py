"""Twisted boundary conditions and twist averaging (TABC).

Neither the reference's WIP PBC set (ref PBC/*) nor the vendored ferminet PBC
path (ref ferminet/pbc/hamiltonian.py) implements twist averaging; this adds
the standard capability for the periodic configs.

A twist theta (fractional reciprocal coordinates) imposes
psi(r + L) = exp(i k_theta . L) psi(r) with k_theta = theta @ rec. It is
applied as a plane-wave boost on the whole wavefunction,

    psi_theta(r_1..r_N) = exp(i k_theta . sum_i r_i) * psi_periodic(...),

i.e. phase += k_theta . sum_i r_i on the (phase, log|psi|) output. |psi|^2 and
the sampler are untouched; the kinetic energy picks up the exact boost terms
through the complex/pair local-energy path, so this REQUIRES
complex_orbitals=True (the TPU-safe complex_pairs representation works — no
complex dtype anywhere, so twisted runs execute on the chip).

Twist averaging = independent evaluations over a Monkhorst-Pack twist grid,
averaged; it removes the O(1/N) single-point (Gamma) momentum-quantisation
finite-size error.
"""

from __future__ import annotations

import itertools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def twist_wavevector(lattice, twist_frac) -> jnp.ndarray:
    """Cartesian k for a fractional twist (lattice rows = primitive vectors)."""
    lattice = jnp.asarray(lattice)
    rec = 2 * jnp.pi * jnp.linalg.inv(lattice).T
    return jnp.asarray(twist_frac) @ rec


def monkhorst_pack_twists(n: int) -> np.ndarray:
    """Fractional n x n x n Monkhorst-Pack twist grid in [-1/2, 1/2)^3."""
    pts = (np.arange(n) + 0.5) / n - 0.5
    return np.array(list(itertools.product(pts, repeat=3)))


def apply_twist(network, lattice, twist_frac, ndim: int = 3):
    """Wraps a complex-mode Network with the plane-wave twist boost."""
    k = twist_wavevector(lattice, twist_frac)
    base_apply = network.apply

    def apply(params, pos, spins, atoms, charges
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        phase, mag = base_apply(params, pos, spins, atoms, charges)
        boost = jnp.sum(jnp.reshape(pos, (-1, ndim)) @ k)
        return phase + boost, mag

    import dataclasses
    return dataclasses.replace(network, apply=apply)


def real_to_angle(network):
    """Converts a REAL network's sign output into a phase ANGLE (sign +1 -> 0,
    sign -1 -> pi) so the twist boost and the complex estimators apply to a
    Gamma-trained real checkpoint. The sign is piecewise constant, so its
    phase gradient is zero almost everywhere and the complex kinetic path
    reduces to the real one plus the exact boost terms; psi-ratio estimators
    see cos(+-pi) = -1 at sign flips, identical to the sign product."""
    base_apply = network.apply

    def apply(params, pos, spins, atoms, charges
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        sign, mag = base_apply(params, pos, spins, atoms, charges)
        return jnp.pi * 0.5 * (1.0 - sign), mag

    import dataclasses
    return dataclasses.replace(network, apply=apply)
