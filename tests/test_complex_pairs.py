"""Pair-complex (re, im) representation vs the complex64 reference path.

The TPU backend has no complex64, so complex orbitals (ref
wavefunction_Ynlm/nn.py:456) run as explicit real pairs end-to-end
(ops/slogdet.slogdet_pair, models/blocks.logdet_matmul_pair, pair_output
kinetic/local-energy/loss). These tests pin exact equivalence against the
complex-dtype path on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiqmc_tpu.models import network as nn
from aiqmc_tpu.models import spin_indices
from aiqmc_tpu.models.network import AINetData


def _nets(determinants=2, complex_pairs=False):
    charges = jnp.array([2.0])
    spins = np.array([1.0, -1.0])
    up, down = spin_indices.spin_indices_h(spins)
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(spins, 2)
    kw = dict(nspins=(1, 1), charges=charges, parallel_indices=par,
              antiparallel_indices=anti, spin_up_indices=up,
              spin_down_indices=down, n_parallel=n_par, n_antiparallel=n_anti,
              ndim=3, natoms=1, nelectrons=2, determinants=determinants,
              hidden_dims=((8, 4), (8, 4)), hidden_dims_Ynlm=(4, 4),
              full_equivariance=True, bounded_envelope=True,
              regular_harmonics=True, complex_orbitals=True)
    return (nn.make_ai_net(complex_pairs=complex_pairs, **kw),
            jnp.asarray(spins), jnp.zeros((1, 3)), charges)


def test_slogdet_pair_matches_complex():
    from aiqmc_tpu.ops import slogdet as S
    rng = np.random.RandomState(0)
    ar = rng.standard_normal((5, 4, 4)).astype(np.float32)
    ai = rng.standard_normal((5, 4, 4)).astype(np.float32)
    c = ar + 1j * ai
    sign, logd = np.linalg.slogdet(c)
    cos, sin, logabs = S.slogdet_pair(jnp.asarray(ar), jnp.asarray(ai))
    np.testing.assert_allclose(logabs, logd, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(cos) + 1j * np.asarray(sin), sign,
                               atol=2e-5)
    br, bi = S.inv_pair(jnp.asarray(ar), jnp.asarray(ai))
    np.testing.assert_allclose(np.asarray(br) + 1j * np.asarray(bi),
                               np.linalg.inv(c), rtol=2e-3, atol=2e-4)


def test_slogdet_pair_jvp_matches_complex_rule():
    from aiqmc_tpu.ops import slogdet as S
    rng = np.random.RandomState(1)
    ar, ai, dar, dai = (rng.standard_normal((3, 3, 3)) for _ in range(4))
    out, tang = jax.jvp(S.slogdet_pair,
                        (jnp.asarray(ar), jnp.asarray(ai)),
                        (jnp.asarray(dar), jnp.asarray(dai)))
    tr = np.einsum("...ji,...ij->...", np.linalg.inv(ar + 1j * ai),
                   dar + 1j * dai)
    np.testing.assert_allclose(tang[2], tr.real, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(tang[0], -np.asarray(out[1]) * tr.imag,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(tang[1], np.asarray(out[0]) * tr.imag,
                               rtol=1e-5, atol=1e-6)


def test_network_pair_matches_complex():
    netC, spins, atoms, charges = _nets(complex_pairs=False)
    netP, *_ = _nets(complex_pairs=True)
    params = netC.init(jax.random.PRNGKey(0))
    pos = 0.8 * jax.random.normal(jax.random.PRNGKey(1), (6,))
    phC, lgC = netC.apply(params, pos, spins, atoms, charges)
    phP, lgP = netP.apply(params, pos, spins, atoms, charges)
    np.testing.assert_allclose(lgC, lgP, rtol=1e-5, atol=1e-5)
    phCa = np.angle(phC) if np.iscomplexobj(phC) else float(phC)
    d = (phCa - float(phP)) % (2 * np.pi)
    assert min(d, 2 * np.pi - d) < 1e-4
    gC = jax.grad(lambda p: netC.apply(params, p, spins, atoms, charges)[1])(pos)
    gP = jax.grad(lambda p: netP.apply(params, p, spins, atoms, charges)[1])(pos)
    np.testing.assert_allclose(gC, gP, rtol=1e-4, atol=1e-5)


def test_pair_local_energy_and_loss_grad_match_complex():
    from aiqmc_tpu import loss as loss_lib
    from aiqmc_tpu.hamiltonian import local_energy as ae_le
    netC, spins, atoms, charges = _nets(complex_pairs=False)
    netP, *_ = _nets(complex_pairs=True)
    params = netC.init(jax.random.PRNGKey(0))
    pos = 0.7 * jax.random.normal(jax.random.PRNGKey(2), (8, 6))
    data = AINetData(positions=pos, spins=spins, atoms=atoms, charges=charges)
    leC = ae_le.local_energy(netC.apply, charges, (1, 1), complex_output=True)
    leP = ae_le.local_energy(netP.apply, charges, (1, 1), complex_output=True,
                             pair_output=True)
    key = jax.random.PRNGKey(3)
    for clip in (0.0, 5.0):
        lossC = loss_lib.make_loss(nn.make_log_network(netC.apply), leC,
                                   clip_local_energy=clip, complex_output=True)
        lossP = loss_lib.make_loss(nn.make_pair_log_network(netP.apply), leP,
                                   clip_local_energy=clip, complex_output=True,
                                   pair_output=True)
        (vC, auxC), gC = jax.value_and_grad(lossC, has_aux=True)(params, key, data)
        (vP, auxP), gP = jax.value_and_grad(lossP, has_aux=True)(params, key, data)
        np.testing.assert_allclose(vC, vP, rtol=1e-5, atol=1e-5)
        elC, elP = np.asarray(auxC.local_energy), np.asarray(auxP.local_energy)
        np.testing.assert_allclose(elC.real, elP[:, 0], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(elC.imag, elP[:, 1], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(auxC.variance, auxP.variance,
                                   rtol=1e-4, atol=1e-5)
        fC = jnp.concatenate([x.reshape(-1)
                              for x in jax.tree_util.tree_leaves(gC)])
        fP = jnp.concatenate([x.reshape(-1)
                              for x in jax.tree_util.tree_leaves(gP)])
        np.testing.assert_allclose(fC, fP, rtol=1e-4, atol=1e-4)


def test_wqmc_pair_finite_grad():
    """WQMC objective in pair mode: runs and yields finite gradients."""
    from aiqmc_tpu import loss as loss_lib
    from aiqmc_tpu.hamiltonian import local_energy as ae_le
    netP, spins, atoms, charges = _nets(complex_pairs=True)
    params = netP.init(jax.random.PRNGKey(0))
    pos = 0.7 * jax.random.normal(jax.random.PRNGKey(2), (8, 6))
    data = AINetData(positions=pos, spins=spins, atoms=atoms, charges=charges)
    leP = ae_le.local_energy(netP.apply, charges, (1, 1), complex_output=True,
                             pair_output=True)
    lossP = loss_lib.make_wqmc_loss(
        nn.make_pair_log_network(netP.apply), leP, clip_local_energy=5.0,
        complex_output=True, pair_output=True)
    (v, aux), g = jax.value_and_grad(lossP, has_aux=True)(
        params, jax.random.PRNGKey(3), data)
    assert np.isfinite(v)
    flat = jnp.concatenate([x.reshape(-1)
                            for x in jax.tree_util.tree_leaves(g)])
    assert np.isfinite(flat).all()


def test_train_complex_pairs_end_to_end(tmp_path):
    from aiqmc_tpu import config as config_lib
    from aiqmc_tpu import train
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.array([[0.0, 0.0, -0.7], [0.0, 0.0, 0.7]])
        cfg.system.charges = np.array([1.0, 1.0])
        cfg.system.spins = np.array([1.0, -1.0])
        cfg.batch_size = 16
        cfg.optim.iterations = 3
        cfg.mcmc.steps = 2
        cfg.mcmc.burn_in = 2
        cfg.network.hidden_dims = ((8, 4), (8, 4))
        cfg.network.hidden_dims_ynlm = (4, 4)
        cfg.network.complex_orbitals = True
        cfg.network.complex_pairs = True
        cfg.debug.deterministic = True
        cfg.log.save_path = str(tmp_path)
        cfg.log.save_frequency = 1e9
    result = train.train(cfg)
    assert np.all(np.isfinite(result.energies))


def test_logdet_matmul_pair_all_1x1_blocks():
    """Single-electron-per-spin systems produce only 1x1 determinant blocks;
    the pair path must match the complex logdet_matmul (round-1 advisor
    finding: cos/sin stayed None and crashed)."""
    import jax.numpy as jnp
    import numpy as np
    from aiqmc_tpu.models import blocks

    rng = np.random.RandomState(0)
    ndet = 4
    xr = [rng.randn(ndet, 1, 1).astype(np.float32) for _ in range(2)]
    xi = [rng.randn(ndet, 1, 1).astype(np.float32) for _ in range(2)]
    phase, log = blocks.logdet_matmul_pair(
        [(jnp.asarray(r), jnp.asarray(i)) for r, i in zip(xr, xi)])
    want_phase, want_log = blocks.logdet_matmul(
        [r + 1j * i for r, i in zip(xr, xi)])
    np.testing.assert_allclose(float(log), float(want_log), rtol=1e-5)
    np.testing.assert_allclose(float(phase), float(want_phase), rtol=1e-5)


def test_logdet_matmul_pair_mixed_1x1_and_big_blocks():
    import jax.numpy as jnp
    import numpy as np
    from aiqmc_tpu.models import blocks

    rng = np.random.RandomState(1)
    ndet = 3
    big_r = rng.randn(ndet, 3, 3).astype(np.float32)
    big_i = rng.randn(ndet, 3, 3).astype(np.float32)
    one_r = rng.randn(ndet, 1, 1).astype(np.float32)
    one_i = rng.randn(ndet, 1, 1).astype(np.float32)
    phase, log = blocks.logdet_matmul_pair(
        [(jnp.asarray(big_r), jnp.asarray(big_i)),
         (jnp.asarray(one_r), jnp.asarray(one_i))])
    want_phase, want_log = blocks.logdet_matmul(
        [big_r + 1j * big_i, one_r + 1j * one_i])
    np.testing.assert_allclose(float(log), float(want_log), rtol=1e-4)
    # phases equal mod 2pi
    d = (float(phase) - float(want_phase)) % (2 * np.pi)
    assert min(d, 2 * np.pi - d) < 1e-4
