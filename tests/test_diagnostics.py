"""Normalisability diagnostic: catches the flat-log|psi|-tail failure mode
(verify protocol; the reference's unbounded-envelope defect)."""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import diagnostics
from aiqmc_tpu.models import network as nn, spin_indices
from aiqmc_tpu.models.network import AINetData


def _data(nelec=4):
    spins = np.array([1.0, 1.0, -1.0, -1.0])
    pos = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (nelec * 3,))
    return AINetData(positions=pos, spins=jnp.asarray(spins),
                     atoms=jnp.zeros((1, 3)), charges=jnp.asarray([4.0]))


def test_decaying_stub_passes():
    def logabs(params, pos, spins, atoms, charges):
        r = jnp.linalg.norm(pos.reshape(-1, 3) - atoms[0], axis=-1)
        return -jnp.sum(r)

    ok, prof = diagnostics.check_normalisable(logabs, None, _data())
    assert ok
    assert prof.shape == (4, 4)
    assert np.all(np.diff(prof, axis=1) < 0)


def test_flat_tail_fails():
    """A bounded (non-decaying) ansatz — the ionising failure mode — is
    rejected."""
    def logabs(params, pos, spins, atoms, charges):
        r = jnp.linalg.norm(pos.reshape(-1, 3) - atoms[0], axis=-1)
        return -jnp.sum(jnp.tanh(r))   # flattens beyond r ~ 2

    ok, _ = diagnostics.check_normalisable(logabs, None, _data())
    assert not ok


def test_real_network_is_normalisable():
    """The production default (bounded envelope) decays on every electron
    ray."""
    nelec = 4
    spins = np.array([1.0, 1.0, -1.0, -1.0])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, nelec)
    up, down = spin_indices.spin_indices_h(spins)
    net = nn.make_ai_net(
        nspins=(2, 2), charges=jnp.asarray([4.0]), parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=1,
        nelectrons=nelec, determinants=2, hidden_dims=((8, 4), (8, 4)),
        hidden_dims_Ynlm=(4, 4), full_equivariance=True,
        bounded_envelope=True, complex_orbitals=False)
    params = net.init(jax.random.PRNGKey(1))

    def logabs(p, pos, s, a, c):
        return net.apply(p, pos, s, a, c)[1]

    ok, prof = diagnostics.check_normalisable(logabs, params, _data())
    assert ok, prof
