"""On-chip probe gating the complex-pair forward Laplacian.

The forward pair kinetic (ops/forward_laplacian.make_forward_kinetic_pair)
is CPU-validated against the batched-tangent pair kinetic
(tests/test_forward_laplacian.py pair section), but the axon TPU backend has
a history of shape-dependent miscompiles (dmc/propagate.py:5-16), so flip
PBC/twist production scripts to ``optim.laplacian="forward"`` only after
this probe reports round-off-level agreement ON THE CHIP.

Evaluates batched local energies of the diamond ccECP twist config with
(a) the default batched-tangent pair kinetic and (b) the forward pair
kinetic, same positions, and prints max|a-b| per component.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/probe_forward_pair.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import config as config_lib
from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.sampling.init_electrons import init_electrons
from aiqmc_tpu.train import _build_local_energy, _build_network
from aiqmc_tpu.configs import diamond_ccecp


def build(laplacian):
    cfg = diamond_ccecp.get_config()
    with cfg.unlocked():
        cfg.network.hidden_dims = ((16, 8),) * 2
        cfg.network.hidden_dims_ynlm = (8, 8)
        cfg.network.determinants = 2
        cfg.network.complex_orbitals = True
        cfg.network.complex_pairs = True
        cfg.system.twist = (0.25, -0.25, 0.25)
        cfg.optim.laplacian = laplacian
    cfg = config_lib.resolve(cfg)
    network, _ = _build_network(cfg)
    e_l = _build_local_energy(cfg, network)
    return cfg, network, e_l


cfg, network, e_l_default = build("default")
_, _, e_l_forward = build("forward")

key = jax.random.PRNGKey(0)
params = network.init(key)
atoms = jnp.asarray(cfg.system.atoms)
charges = jnp.asarray(cfg.system.charges)
spins = jnp.asarray(cfg.system.spins)
batch = 64
pos, spins_b = init_electrons(key, None, atoms, charges, spins,
                              batch_size=batch, init_width=1.0)
data = AINetData(positions=pos, spins=spins_b, atoms=atoms, charges=charges)

in_axes = (None, 0, AINetData(positions=0, spins=None, atoms=None,
                              charges=None))
keys = jax.random.split(jax.random.PRNGKey(1), batch)
run_d = jax.jit(jax.vmap(lambda p, k, d: e_l_default(p, k, d)[0],
                         in_axes=in_axes))
run_f = jax.jit(jax.vmap(lambda p, k, d: e_l_forward(p, k, d)[0],
                         in_axes=in_axes))
# Same quadrature keys => the nonlocal term is identical; only the kinetic
# differs between the two programs.
a = np.asarray(run_d(params, keys, data))
b = np.asarray(run_f(params, keys, data))
diff = np.abs(a - b)
scale = np.abs(a).max(axis=0)
print("E_L[re] max|diff| = %.3e (scale %.3e)" % (diff[:, 0].max(), scale[0]))
print("E_L[im] max|diff| = %.3e (scale %.3e)" % (diff[:, 1].max(), scale[1]))
tol = 5e-4 * max(scale.max(), 1.0)
if diff.max() < tol:
    print("PROBE PASS: forward pair kinetic agrees on this backend "
          "(max|diff| %.3e < %.3e); PBC/twist scripts may set "
          "optim.laplacian='forward'." % (diff.max(), tol))
else:
    print("PROBE FAIL: keep optim.laplacian='default' for pair/twist runs "
          "(max|diff| %.3e >= %.3e)." % (diff.max(), tol))
