"""The DMC keyword path must build EXACTLY the wavefunction training built.

Regression for the diamond fixed-phase DMC incident: a hand-rolled
make_ai_net call in the driver restored a VMC checkpoint cleanly (same param
tree) but evaluated a different ansatz (make_ai_net defaults
bounded_envelope/regular_harmonics=False vs the trained config's True),
NaN-ing all blocks. driver._network_from_kwargs now routes through
train.network_from_config, so the two constructions must agree pointwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aiqmc_tpu import config as config_lib, train as train_lib
from aiqmc_tpu.dmc import driver

ATOMS = np.array([[0.0, 0.0, -0.7], [0.0, 0.0, 0.7]])
CHARGES = np.array([1.0, 1.0])
SPINS = np.array([1.0, -1.0])
KWARGS = {"hidden_dims": ((8, 4), (8, 4)), "hidden_dims_Ynlm": (4, 4),
          "determinants": 2}


def _config_network():
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = ATOMS
        cfg.system.charges = CHARGES
        cfg.system.spins = SPINS
        cfg.network.hidden_dims = KWARGS["hidden_dims"]
        cfg.network.hidden_dims_ynlm = KWARGS["hidden_dims_Ynlm"]
        cfg.network.determinants = 2
    return train_lib.network_from_config(cfg)


def test_keyword_path_matches_config_network():
    net_cfg = _config_network()
    net_kw = driver._network_from_kwargs(
        atoms=ATOMS, charges=CHARGES, spins=SPINS, ndim=3, use_pp=False,
        lattice=None, twist=None, network_kwargs=dict(KWARGS))
    params = net_cfg.init(jax.random.PRNGKey(0))
    pos = jax.random.normal(jax.random.PRNGKey(1), (6,))
    spins_j = jnp.asarray(SPINS)
    atoms_j = jnp.asarray(ATOMS)
    charges_j = jnp.asarray(CHARGES)
    s1, l1 = net_cfg.apply(params, pos, spins_j, atoms_j, charges_j)
    s2, l2 = net_kw.apply(params, pos, spins_j, atoms_j, charges_j)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))


def test_keyword_path_applies_trainer_flag_defaults():
    """The trained-config behaviour flags (bounded_envelope etc.) must be on
    in the keyword-built network: same param tree as a raw make_ai_net with
    its own (False) defaults, DIFFERENT logabs — the incident's signature."""
    from aiqmc_tpu.models import network as nn, spin_indices
    net_kw = driver._network_from_kwargs(
        atoms=ATOMS, charges=CHARGES, spins=SPINS, ndim=3, use_pp=False,
        lattice=None, twist=None, network_kwargs=dict(KWARGS))
    par, anti, n_par, n_anti = spin_indices.jastrow_indices_ee(SPINS, 2)
    up, down = spin_indices.spin_indices_h(SPINS)
    net_raw = nn.make_ai_net(
        ndim=3, nelectrons=2, natoms=2, nspins=(1, 1),
        charges=jnp.asarray(CHARGES), parallel_indices=par,
        antiparallel_indices=anti, n_parallel=n_par, n_antiparallel=n_anti,
        spin_up_indices=up, spin_down_indices=down, complex_orbitals=False,
        full_equivariance=True, **KWARGS)
    params = net_kw.init(jax.random.PRNGKey(0))
    pos = jax.random.normal(jax.random.PRNGKey(1), (6,)) * 2.0
    _, l_kw = net_kw.apply(params, pos, jnp.asarray(SPINS),
                           jnp.asarray(ATOMS), jnp.asarray(CHARGES))
    _, l_raw = net_raw.apply(params, pos, jnp.asarray(SPINS),
                             jnp.asarray(ATOMS), jnp.asarray(CHARGES))
    assert not np.allclose(np.asarray(l_kw), np.asarray(l_raw), rtol=1e-6), (
        "raw make_ai_net defaults now match the trainer's — update this test "
        "(the keyword path must still route through network_from_config)")


def test_keyword_path_rejects_unknown_kwargs():
    with pytest.raises(ValueError, match="network_from_config"):
        driver._network_from_kwargs(
            atoms=ATOMS, charges=CHARGES, spins=SPINS, ndim=3, use_pp=False,
            lattice=None, twist=None,
            network_kwargs={"feature_layer": object()})
