"""On-chip probe gating the REAL-output forward Laplacian on this toolchain.

The real forward Laplacian (ops/forward_laplacian.make_forward_kinetic) was
chip-proven on the round-1 toolchain (bench + every c_kfac run used it), but
the box/toolchain changed and the PAIR variant now miscompiles on this stack
(runs/probe_forward_pair.log: max|diff| 36 Ha), so re-gate the real path too
before trusting laplacian="forward" production stages (Si retry, arm-C
fstream, bench).

Compares batched local energies of the C ccECP atom config with
(a) the batched-tangent Laplacian and (b) the forward Laplacian, same
positions and quadrature keys, and prints max|a-b|.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/probe_forward_real.py
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
from aiqmc_tpu.configs import c_atom_ccecp


def build(laplacian):
    cfg = c_atom_ccecp.get_config()
    with cfg.unlocked():
        cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
        cfg.network.hidden_dims = ((32, 16),) * 3
        cfg.network.hidden_dims_ynlm = (8, 8, 8)
        cfg.network.determinants = 4
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
scale = max(np.abs(a).max(), 1.0)
print("E_L max|diff| = %.3e (scale %.3e)" % (diff.max(), scale))
tol = 5e-4 * scale
if diff.max() < tol:
    print("PROBE PASS: real forward Laplacian agrees on this backend "
          "(max|diff| %.3e < %.3e); laplacian='forward' stays safe for "
          "production scripts." % (diff.max(), tol))
else:
    print("PROBE FAIL: set optim.laplacian='default' in production scripts "
          "on this toolchain (max|diff| %.3e >= %.3e)."
          % (diff.max(), tol))
