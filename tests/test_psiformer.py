"""PsiFormer tests (pattern: ref ferminet/tests/psiformer_test.py:54-187)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiqmc_tpu.models import psiformer, spin_indices


def _build(nelec=4, natoms=2, determinants=2):
    spins = np.array([1.0] * (nelec // 2) + [-1.0] * (nelec - nelec // 2))
    rng = np.random.RandomState(0)
    atoms = jnp.asarray(rng.uniform(-1, 1, (natoms, 3)))
    charges = jnp.asarray(np.full(natoms, float(nelec) / natoms))
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nelec)
    up, down = spin_indices.spin_indices_h(spins)
    net = psiformer.make_psiformer(
        nspins=(len(up), len(down)), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=natoms,
        nelectrons=nelec, determinants=determinants, num_layers=2,
        num_heads=2, heads_dim=8, mlp_hidden_dims=(16,))
    return net, atoms, charges, jnp.asarray(spins)


def test_forward_finite():
    net, atoms, charges, spins = _build()
    params = net.init(jax.random.PRNGKey(0))
    pos = jax.random.normal(jax.random.PRNGKey(1), (12,))
    phase, log = net.apply(params, pos, spins, atoms, charges)
    assert np.isfinite(float(log))
    assert float(phase) in (-1.0, 1.0)


def test_antisymmetry():
    net, atoms, charges, spins = _build(nelec=4)
    params = net.init(jax.random.PRNGKey(2))
    pos = jax.random.normal(jax.random.PRNGKey(3), (4, 3)) * 1.5
    phase1, log1 = net.apply(params, pos.reshape(-1), spins, atoms, charges)
    # swap same-spin electrons 0, 1 (both up)
    pos2 = pos.at[jnp.array([0, 1])].set(pos[jnp.array([1, 0])])
    phase2, log2 = net.apply(params, pos2.reshape(-1), spins, atoms, charges)
    np.testing.assert_allclose(float(log2), float(log1), rtol=1e-5)
    np.testing.assert_allclose(float(phase2), -float(phase1), atol=1e-6)


def test_local_energy_runs():
    from aiqmc_tpu.hamiltonian import local_energy
    from aiqmc_tpu.models.network import AINetData

    net, atoms, charges, spins = _build()
    params = net.init(jax.random.PRNGKey(4))
    pos = jax.random.normal(jax.random.PRNGKey(5), (12,))
    data = AINetData(positions=pos, spins=spins, atoms=atoms, charges=charges)
    e_l = local_energy.local_energy(net.apply, charges, (2, 2))
    e, _ = e_l(params, jax.random.PRNGKey(0), data)
    assert np.isfinite(float(e))
