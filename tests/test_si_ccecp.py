"""Si ccECP config: the pseudopotential path for BASELINE config #3's named
element, driven from a user-supplied nwchem table (the reference ships only
carbon tables — ref AIQMCrelease3/pseudopotential/C.ccECP.nwchem — and its
generic loader was never finished, ref readpp.py:44).

The table text below is SYNTHETIC (round numbers, correct nwchem structure and
Ne-core bookkeeping) — it proves the Si wiring end to end without fabricating
literature parameters.
"""
import numpy as np
import pytest

SYNTH_SI = """\
# synthetic Si test table (NOT physical ccECP values)
Si nelec 10
Si ul
1 5.0 4.0
3 9.0 20.0
2 4.0 -15.0
Si S
2 5.5 40.0
Si P
2 5.4 28.0
"""


def test_si_ccecp_requires_source():
    from aiqmc_tpu.configs import si_ccecp
    with pytest.raises(ValueError, match="not shipped"):
        si_ccecp.get_config()


def test_si_ccecp_config_builds_and_evaluates():
    """Z_eff = 14 - 10 = 4; network + ECP local energy build and give finite
    E_L — the full Si pseudopotential path (parser -> configure_pp -> pp
    Hamiltonian) with l = 0,1 nonlocal channels."""
    import jax
    import jax.numpy as jnp
    from aiqmc_tpu import train as train_lib
    from aiqmc_tpu.configs import si_ccecp
    from aiqmc_tpu.models.network import AINetData

    cfg = si_ccecp.get_config(SYNTH_SI)
    np.testing.assert_array_equal(np.asarray(cfg.system.charges), [4.0])
    assert cfg.system.use_pp
    with cfg.unlocked():
        cfg.network.hidden_dims = ((8, 4), (8, 4))
        cfg.network.hidden_dims_ynlm = (4, 4)
        cfg.network.determinants = 2
    network = train_lib.network_from_config(cfg)
    local_energy = train_lib._build_local_energy(cfg, network)

    params = network.init(jax.random.PRNGKey(0))
    batch = 4
    pos = 0.8 * jax.random.normal(jax.random.PRNGKey(1), (batch, 12))
    data = AINetData(positions=pos,
                     spins=jnp.asarray(np.asarray(cfg.system.spins)),
                     atoms=jnp.asarray(np.asarray(cfg.system.atoms)),
                     charges=jnp.asarray(np.asarray(cfg.system.charges)))
    keys = jax.random.split(jax.random.PRNGKey(2), batch)
    batch_le = jax.vmap(local_energy, in_axes=(None, 0, AINetData(
        positions=0, spins=None, atoms=None, charges=None)))
    e_l, _ = batch_le(params, keys, data)
    assert np.isfinite(np.asarray(e_l)).all()
