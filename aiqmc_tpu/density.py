"""One-body reduced density matrix and density estimators.

Capability parity with ref ``ferminet/observables.py:275-407`` +
``ferminet/density.py`` (one-RDM estimation): the upstream samples the primed
coordinate r' with an auxiliary MCMC against an HF density (pyscf-backed);
pyscf is absent here, so r' runs over a user-supplied quadrature/grid of
points and the estimator is

    rho_1(r', r_1) ~ < psi(r_1 -> r') / psi(x) >_{|psi|^2}

evaluated for all (walker, grid point) pairs in ONE batched network call — the
same fused psi-ratio machinery as the nonlocal ECP (hamiltonian/ecp.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from aiqmc_tpu.models.network import AINetData


def make_one_rdm(signed_network, nelectrons: int, ndim: int = 3,
                 electron: int = 0):
    """Returns rdm(params, data, rprime) -> per-walker psi-ratio row.

    rprime: (npoints, ndim) primed positions. Output: (batch, npoints) of
    Re[psi(x with electron -> r') / psi(x)]; its |psi|^2 average over walkers
    is (up to the r'-measure) a row of the one-RDM against electron 0's
    coordinate.
    """

    def single(params, pos, spins, atoms, charges, rprime):
        phase0, mag0 = signed_network(params, pos, spins, atoms, charges)
        npts = rprime.shape[0]
        base = jnp.broadcast_to(pos, (npts, nelectrons * ndim))
        mask = jnp.zeros((nelectrons * ndim,)).at[
            electron * ndim:(electron + 1) * ndim].set(1.0)
        repl = jnp.tile(rprime, (1, nelectrons))
        configs = base * (1.0 - mask)[None] + repl * mask[None]
        phases, mags = jax.vmap(
            lambda x: signed_network(params, x, spins, atoms, charges))(configs)
        return jnp.exp(mags - mag0) * jnp.cos(phases - phase0)

    def rdm(params, data: AINetData, rprime: jnp.ndarray) -> jnp.ndarray:
        return jax.vmap(
            single, in_axes=(None, 0, None, None, None, None))(
                params, data.positions, data.spins, data.atoms, data.charges,
                rprime)

    return rdm


def radial_density_profile(data: AINetData, bins: int = 64,
                           limit: float = 6.0,
                           center=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spherically averaged electron density n(r) from walker samples."""
    pos = jnp.reshape(data.positions, (data.positions.shape[0], -1, 3))
    origin = jnp.zeros((3,)) if center is None else jnp.asarray(center)
    r = jnp.linalg.norm(pos - origin[None, None], axis=-1).reshape(-1)
    hist, edges = jnp.histogram(r, bins=bins, range=(0.0, limit))
    mids = 0.5 * (edges[1:] + edges[:-1])
    shell = 4.0 * jnp.pi * mids ** 2 * (edges[1] - edges[0])
    nwalkers = data.positions.shape[0]
    return mids, hist / (shell * nwalkers)
