"""Every shipped config builds: get_config() -> resolve -> network + local
energy construct without error (pattern: ref ferminet configs are exercised
only ad hoc; this pins the whole zoo against bit-rot)."""

import importlib

import numpy as np
import pytest

CONFIGS = ["atom", "c2_ccecp", "c2h4", "c_atom_ccecp", "ch4", "diamond",
           "diamond_ccecp", "diatomic", "h4", "hcl", "he2", "heg", "hn",
           "li_excited", "li_wqmc", "nh3", "organic"]


@pytest.mark.parametrize("name", CONFIGS)
def test_config_builds(name):
    from aiqmc_tpu import config as config_lib
    from aiqmc_tpu import train

    mod = importlib.import_module(f"aiqmc_tpu.configs.{name}")
    cfg = mod.get_config()
    with cfg.unlocked():
        # Tiny sizes: this is a construction test, not a physics run.
        cfg.batch_size = 8
        cfg.network.hidden_dims = ((8, 4),)
        cfg.network.hidden_dims_ynlm = (4,)
        cfg.network.determinants = 2
        if cfg.network.get("psiformer", None):
            cfg.network.psiformer.num_layers = 1
    cfg = config_lib.resolve(cfg)
    network, _ = train._build_network(cfg)
    import jax
    params = network.init(jax.random.PRNGKey(0))
    assert params is not None
    e_l = train._build_local_energy(cfg, network)
    assert callable(e_l)
