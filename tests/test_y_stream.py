"""y_stream=False: the exact published-FermiNet orbital form (no Y factor).

The multiplicative Y_nlm orbital factor (ref AIQMCrelease3/wavefunction_Ynlm/
nn.py:449-452) is the last structural difference between this ansatz and the
published FermiNet (ref ferminet/networks.py:676-774); the flag removes the
factor AND its parameters/compute for the flagship-accuracy ablation arm.
"""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.models import network as nn, spin_indices


def _make(y_stream, h_stream="ferminet"):
    spins = np.array([1.0, 1.0, -1.0, -1.0])
    atoms = jnp.array([[0.0, 0.0, -0.7], [0.0, 0.0, 0.7]])
    charges = jnp.array([2.0, 2.0])
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, 4)
    up, down = spin_indices.spin_indices_h(spins)
    net = nn.make_ai_net(
        nspins=(2, 2), charges=charges, parallel_indices=par,
        antiparallel_indices=anti, spin_up_indices=up, spin_down_indices=down,
        n_parallel=n_par, n_antiparallel=n_anti, ndim=3, natoms=2,
        nelectrons=4, determinants=2, hidden_dims=((16, 8), (16, 8)),
        hidden_dims_Ynlm=(8, 8), h_stream=h_stream, y_stream=y_stream,
        complex_orbitals=False, full_equivariance=True)
    return net, spins, atoms, charges


def test_y_stream_off_has_no_y_params():
    net, *_ = _make(y_stream=False)
    params = net.init(jax.random.PRNGKey(0))
    assert "y" not in params
    assert "streams_y" not in params["layers"]
    net_on, *_ = _make(y_stream=True)
    params_on = net_on.init(jax.random.PRNGKey(0))
    assert "y" in params_on and "streams_y" in params_on["layers"]


def test_y_stream_off_antisymmetric_and_distinct():
    net, spins, atoms, charges = _make(y_stream=False)
    params = net.init(jax.random.PRNGKey(1))
    pos = jax.random.normal(jax.random.PRNGKey(2), (12,))
    s1, l1 = net.apply(params, pos, jnp.asarray(spins), atoms, charges)
    # Swap the two spin-up electrons: sign flips, magnitude unchanged.
    swapped = jnp.concatenate([pos[3:6], pos[0:3], pos[6:]])
    s2, l2 = net.apply(params, swapped, jnp.asarray(spins), atoms, charges)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    assert float(s1) == -float(s2)
    # And the ansatz genuinely differs from the Y-on one.
    net_on, *_ = _make(y_stream=True)
    params_on = net_on.init(jax.random.PRNGKey(1))
    _, l_on = net_on.apply(params_on, pos, jnp.asarray(spins), atoms, charges)
    assert abs(float(l_on) - float(l1)) > 1e-8


def test_y_stream_off_gradient_and_kinetic_finite():
    net, spins, atoms, charges = _make(y_stream=False, h_stream="ainet")
    params = net.init(jax.random.PRNGKey(3))
    pos = jax.random.normal(jax.random.PRNGKey(4), (12,))

    def logabs(p):
        return net.apply(params, p, jnp.asarray(spins), atoms, charges)[1]

    g = jax.grad(logabs)(pos)
    assert np.all(np.isfinite(np.asarray(g)))
    gp = jax.grad(lambda w: net.apply(
        w, pos, jnp.asarray(spins), atoms, charges)[1])(params)
    for leaf in jax.tree_util.tree_leaves(gp):
        assert np.all(np.isfinite(np.asarray(leaf)))
