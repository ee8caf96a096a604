"""Static structure factor estimator + CCMH finite-size correction tests."""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.pbc import structure_factor as sf


LAT = np.eye(3) * 4.0


def _data(pos):
    return AINetData(positions=jnp.asarray(pos), spins=None, atoms=None,
                     charges=None)


def test_kshells_are_reciprocal():
    k, norm = sf.make_kshells(LAT, nmax=2)
    # every k . a_i must be an integer multiple of 2 pi
    prod = k @ LAT.T / (2 * np.pi)
    np.testing.assert_allclose(prod, np.round(prod), atol=1e-10)
    assert np.all(norm[:-1] <= norm[1:] + 1e-12)
    assert np.all(norm > 0)


def test_perfect_crystal_bragg_peaks():
    """Walkers frozen on a simple-cubic site lattice: S(G) = N exactly at the
    SITE lattice's reciprocal vectors (Bragg), 0 at incommensurate k."""
    # 8 electrons on a 2x2x2 cubic sublattice of the 4.0 cell (spacing 2.0).
    grid = np.stack(np.meshgrid(*[np.arange(2) * 2.0] * 3,
                                indexing="ij"), -1).reshape(-1, 3)
    nelec = len(grid)
    pos = np.tile(grid.reshape(-1), (16, 1))  # identical walkers
    k, norm = sf.make_kshells(LAT, nmax=2)
    est = sf.make_structure_factor(k, nelec)
    sk = np.asarray(est(_data(pos)))
    # <rho_k> over identical walkers cancels the |rho_k|^2 term exactly
    # (the estimator subtracts the coherent part) -> S = 0 everywhere...
    np.testing.assert_allclose(sk, 0.0, atol=1e-8)
    # ...so test the INCOHERENT part directly: per-walker |rho_k|^2 / N.
    phase = grid @ k.T
    rho2 = (np.cos(phase).sum(0) ** 2 + np.sin(phase).sum(0) ** 2) / nelec
    site_recip = (k @ (np.eye(3) * 2.0).T) / (2 * np.pi)  # site lattice 2.0
    bragg = np.all(np.abs(site_recip - np.round(site_recip)) < 1e-9, axis=1)
    np.testing.assert_allclose(rho2[bragg], float(nelec), rtol=1e-10)
    np.testing.assert_allclose(rho2[~bragg], 0.0, atol=1e-8)


def test_uncorrelated_uniform_walkers_give_one():
    """Ideal (uncorrelated) particles: S(k) = 1 for every k != 0."""
    rng = np.random.RandomState(0)
    batch, nelec = 4096, 8
    pos = rng.uniform(0, 4.0, size=(batch, nelec * 3))
    k, _ = sf.make_kshells(LAT, nmax=1)
    est = jax.jit(sf.make_structure_factor(k, nelec))
    sk = np.asarray(est(_data(pos)))
    # stderr of S per k ~ sqrt(2/batch) ~ 0.022; 5 sigma
    np.testing.assert_allclose(sk, 1.0, atol=0.12)


def test_chiesa_correction_recovers_synthetic_alpha():
    """S(k) = a k^2 exactly -> dv = 2 pi a / Omega, zero residual."""
    k, norm = sf.make_kshells(LAT, nmax=2)
    a = 0.37
    sk = a * norm ** 2
    out = sf.chiesa_potential_correction(norm, sk, volume=4.0 ** 3)
    np.testing.assert_allclose(out["a"], a, rtol=1e-6)
    np.testing.assert_allclose(out["dv"], 2 * np.pi * a / 64.0, rtol=1e-6)
    assert out["fit_rel_residual"] < 1e-6


def test_chiesa_flags_non_quadratic():
    k, norm = sf.make_kshells(LAT, nmax=2)
    sk = np.ones_like(norm)  # ideal-gas plateau, nowhere near k^2
    out = sf.chiesa_potential_correction(norm, sk, volume=64.0)
    assert out["fit_rel_residual"] > 0.1


def test_train_loop_accumulates_structure_factor(tmp_path):
    """cfg.observables.structure_factor on a periodic run: the train loop
    accumulates S(k) at every stats step and writes structure_factor.npz
    (kpoints/knorm/sk/count) consumable by chiesa_potential_correction."""
    from aiqmc_tpu import train
    from aiqmc_tpu.configs import heg

    cfg = heg.get_config(rs=1.0, nelec=2)
    with cfg.unlocked():
        cfg.batch_size = 16
        cfg.optim.iterations = 2
        cfg.optim.optimizer = "adam"
        cfg.mcmc.steps = 2
        cfg.mcmc.burn_in = 2
        cfg.network.hidden_dims = ((8, 4), (8, 4))
        cfg.network.hidden_dims_ynlm = (4, 4)
        cfg.observables.structure_factor = True
        cfg.observables.structure_factor_nmax = 1
        cfg.debug.deterministic = True
        cfg.log.save_frequency = 1e9
        cfg.log.stats_frequency = 1
        cfg.log.save_path = str(tmp_path)
    train.train(cfg)
    out = np.load(tmp_path / "structure_factor.npz")
    assert out["count"] == 2
    assert out["kpoints"].shape[1] == 3
    assert out["sk"].shape == (out["kpoints"].shape[0],)
    assert np.all(np.isfinite(out["sk"]))
    # S(k) of a sampled |psi|^2 is a variance-like quantity: >= 0 up to MC
    # noise at tiny batch.
    assert np.all(out["sk"] > -0.5)
