"""Plane-wave (Gamma closed shell) pretraining targets for jellium/PBC.

The reference has no pretraining path for its HEG config
(ref ferminet/configs/heg.py; ref ferminet/pretrain.py:119-211 is molecular
pyscf-SCF only); these tests pin the rebuild's `make_planewave_targets`:
correct closed-shell k selection, exact lattice periodicity, non-singular
target determinants, the odd-count guard, and the end-to-end fit path via
``pretrain_orbitals(target="planewave", lattice=...)``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiqmc_tpu import pretrain
from aiqmc_tpu.models import network as nn, spin_indices
from aiqmc_tpu.models.network import AINetData

L = 3.0
LATTICE = L * np.eye(3)


def test_planewave_targets_shapes_and_periodicity():
    targets = pretrain.make_planewave_targets(LATTICE, (7, 7))
    rs = np.random.RandomState(0)
    pos = jnp.asarray(rs.uniform(0, L, size=(14 * 3,)))
    up, down = targets(pos)
    assert up.shape == (7, 7) and down.shape == (7, 7)
    assert np.isfinite(np.asarray(up)).all()
    # Exact periodicity under a full lattice translation of every electron.
    shift = jnp.tile(jnp.asarray([L, 0.0, 0.0]), 14)
    up2, down2 = targets(pos + shift)
    np.testing.assert_allclose(np.asarray(up2), np.asarray(up), atol=5e-6)
    np.testing.assert_allclose(np.asarray(down2), np.asarray(down), atol=5e-6)
    # The closed-shell target determinant is non-singular at generic points.
    sign, logdet = np.linalg.slogdet(np.asarray(up))
    assert sign != 0 and np.isfinite(logdet)


def test_planewave_closed_shell_uses_shortest_k():
    """For 7 electrons in a SC cell the occupied pairs are the 3 (2pi/L) axes:
    columns beyond the constant must be exactly cos/sin of those waves."""
    targets = pretrain.make_planewave_targets(LATTICE, (7, 0))
    rs = np.random.RandomState(1)
    x = rs.uniform(0, L, size=(7, 3))
    up, _ = targets(jnp.asarray(x.ravel()))
    up = np.asarray(up)
    np.testing.assert_allclose(up[:, 0], 1.0, atol=1e-6)
    k = 2 * np.pi / L
    expected = []
    for axis in range(3):
        expected.append(np.cos(k * x[:, axis]))
        expected.append(np.sin(k * x[:, axis]))
    # Axis order within the degenerate shell is an implementation detail:
    # match each expected wave to its nearest actual column (f32 safe).
    got = up[:, 1:].T  # (6, 7)
    for want in expected:
        dist = np.abs(got - np.asarray(want)[None]).max(axis=1)
        assert dist.min() < 1e-4, f"no column matches wave (min {dist.min()})"


def test_planewave_even_count_raises():
    with pytest.raises(ValueError, match="odd"):
        pretrain.make_planewave_targets(LATTICE, (4, 4))


def test_planewave_requires_lattice():
    spins = np.array([1.0, -1.0])
    data = AINetData(positions=jnp.zeros((4, 6)), spins=jnp.asarray(spins),
                     atoms=jnp.zeros((1, 3)), charges=jnp.asarray([2.0]))
    with pytest.raises(ValueError, match="planewave"):
        pretrain.pretrain_orbitals(None, data, (1, 1), target="planewave",
                                   params={})


def test_pretrain_planewave_reduces_orbital_loss():
    nelec = 6
    spins = np.array([1.0] * 3 + [-1.0] * 3)
    atoms = jnp.zeros((1, 3))
    charges = jnp.asarray([float(nelec)])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nelec)
    up_i, down_i = spin_indices.spin_indices_h(spins)
    net = nn.make_ai_net(
        nspins=(3, 3), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up_i,
        spin_down_indices=down_i, n_parallel=n_par, n_antiparallel=n_anti,
        ndim=3, natoms=1, nelectrons=nelec, full_equivariance=True,
        complex_orbitals=False, hidden_dims=((8, 4), (8, 4)),
        hidden_dims_Ynlm=(4, 4))
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (16, nelec * 3), minval=0.0, maxval=L)
    spins_j = jnp.asarray(spins)
    data = AINetData(positions=pos, spins=spins_j, atoms=atoms,
                     charges=charges)
    kwargs = dict(target="planewave", lattice=LATTICE, key=key)
    params0, _ = pretrain.pretrain_orbitals(net, data, (3, 3), iterations=1,
                                            **kwargs)
    params1, _ = pretrain.pretrain_orbitals(net, data, (3, 3), iterations=40,
                                            **kwargs)
    targets = pretrain.make_planewave_targets(LATTICE, (3, 3))

    def orbital_loss(params):
        def single(p):
            dets = net.orbitals(params, p, spins_j, atoms, charges)[0]
            tu, td = targets(p)
            target = jnp.zeros((nelec, nelec))
            target = target.at[:3, :3].set(tu).at[3:, 3:].set(td)
            return jnp.mean((dets.real - target[None]) ** 2)

        return float(jnp.mean(jax.vmap(single)(pos)))

    assert orbital_loss(params1) < orbital_loss(params0)
