"""Importlib plugin hooks (ref ferminet/train.py:440-467,688-702).

Custom local-energy / feature-layer / envelope factories live in this module
and are addressed from the config by their import string, exactly as a user
extension package would be.
"""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import config as config_lib
from aiqmc_tpu import train as train_lib


# --- plugin factories addressed by string from the config ---------------------

def make_harmonic_local_energy(f, charges, nspins, use_scan=False,
                               complex_output=False, k=1.0):
    """Toy plugin: E_L of an external harmonic well (ignores the network)."""
    del f, charges, nspins, use_scan, complex_output

    def _e_l(params, key, data):
        del params, key
        return 0.5 * k * jnp.sum(data.positions ** 2), None

    return _e_l


def make_scaled_features(natoms, nspins, ndim, scale=2.0):
    """Toy plugin feature layer: standard features with r-columns scaled."""
    del nspins
    from aiqmc_tpu.models.features import make_ainet_features
    base = make_ainet_features(natoms, ndim=ndim)

    class Scaled:
        def init(self):
            return base.init()

        def apply(self, ae, r_ae, ee, r_ee):
            ae_f, ee_f = base.apply(ae=ae, r_ae=r_ae, ee=ee, r_ee=r_ee)
            return scale * ae_f, scale * ee_f

    return Scaled()


def make_gaussian_envelope(width=1.0):
    """Toy plugin envelope: isotropic Gaussian per orbital (zoo convention)."""

    def init(natom, norb, ndim=3):
        del ndim
        return {"sigma": width * jnp.ones((natom, norb))}

    def apply(r_ae, ae, params):
        del ae
        return jnp.sum(jnp.exp(-r_ae ** 2 * params["sigma"]), axis=1)

    return init, apply


# --- tests --------------------------------------------------------------------

def _tiny_cfg():
    cfg = config_lib.default()
    with cfg.unlocked():
        cfg.system.atoms = np.zeros((1, 3))
        cfg.system.charges = np.array([2.0])
        cfg.system.spins = np.array([1.0, -1.0])
        cfg.batch_size = 16
        cfg.network.hidden_dims = ((8, 4),) * 2
        cfg.network.hidden_dims_ynlm = (4, 4)
        cfg.mcmc.steps = 2
        cfg.mcmc.burn_in = 0
        cfg.optim.iterations = 2
        cfg.debug.deterministic = True
    return cfg


def test_local_energy_plugin_by_string():
    cfg = _tiny_cfg()
    with cfg.unlocked():
        cfg.system.make_local_energy_fn = (
            "tests.test_plugins.make_harmonic_local_energy")
        cfg.system.make_local_energy_kwargs = {"k": 3.0}
    cfg = config_lib.resolve(cfg)
    network, _ = train_lib._build_network(cfg)
    e_l = train_lib._build_local_energy(cfg, network)
    from aiqmc_tpu.models.network import AINetData
    data = AINetData(positions=jnp.ones((6,)), spins=jnp.asarray([1., -1.]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.asarray([2.0]))
    val, _ = e_l({}, jax.random.PRNGKey(0), data)
    np.testing.assert_allclose(float(val), 0.5 * 3.0 * 6.0, rtol=1e-6)


def test_feature_layer_and_envelope_plugins_by_string():
    cfg = _tiny_cfg()
    with cfg.unlocked():
        # Li (2 up, 1 down) so a same-spin exchange exists to test.
        cfg.system.charges = np.array([3.0])
        cfg.system.spins = np.array([1.0, 1.0, -1.0])
        cfg.network.make_feature_layer_fn = (
            "tests.test_plugins.make_scaled_features")
        cfg.network.make_feature_layer_kwargs = {"scale": 1.5}
        cfg.network.make_envelope_fn = (
            "tests.test_plugins.make_gaussian_envelope")
        cfg.network.make_envelope_kwargs = {"width": 0.5}
    cfg = config_lib.resolve(cfg)
    network, _ = train_lib._build_network(cfg)
    params = network.init(jax.random.PRNGKey(0))
    # Plugin envelope params follow the zoo convention (natom, norb).
    assert params["envelope"]["sigma"].shape == (1, 3)
    spins = jnp.asarray([1., 1., -1.])
    atoms, charges = jnp.zeros((1, 3)), jnp.asarray([3.0])
    pos = jnp.asarray(np.random.RandomState(0).randn(9))
    sign, logabs = network.apply(params, pos, spins, atoms, charges)
    assert np.isfinite(float(logabs))

    # Antisymmetry under same-spin (up-up) exchange still holds with plugin
    # components.
    swapped = jnp.concatenate([pos[3:6], pos[:3], pos[6:]])
    sign2, logabs2 = network.apply(params, swapped, spins, atoms, charges)
    np.testing.assert_allclose(float(logabs), float(logabs2), rtol=1e-5)
    np.testing.assert_allclose(float(sign), -float(sign2), rtol=1e-5)


def test_train_runs_with_local_energy_plugin():
    cfg = _tiny_cfg()
    with cfg.unlocked():
        cfg.system.make_local_energy_fn = (
            "tests.test_plugins.make_harmonic_local_energy")
        cfg.log.save_path = ""
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        with cfg.unlocked():
            cfg.log.save_path = tmp
        result = train_lib.train(cfg)
    assert np.all(np.isfinite(result.energies))
