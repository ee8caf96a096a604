"""Bisect ladder for the per-toolchain forward-Laplacian miscompile.

The 2026-08-18 box miscompiles every forward-Laplacian program
(probe_forward_real: 85 Ha; probe_forward_pair: 36 Ha; all PASS on CPU), which
demotes the kinetic hot path to the slower batched-tangent Laplacian. This
ladder isolates WHICH compiled program shape goes wrong, each rung in its own
jitted program, so one idle chip window localizes the trigger and tests the
chunked-map workaround:

  A  orbital VALUES through the FwdLap interpreter vs plain apply
  B  orbital JACOBIAN through the interpreter vs jax.jacfwd
  C  orbital LAPLACIAN through the interpreter vs the exact Hessian trace
  D  full forward kinetic, ONE walker, vs the batched-tangent kinetic
  E  full forward kinetic, vmap batch 64 (the production/probe shape)
  F  same batch 64 via lax.map over chunks of 8 (workaround candidate)

If A-D pass and E fails, the bug is in the vmapped fused program and F
passing means production can re-enable forward via chunked map. If A fails,
the interpreter's value lane itself miscompiles and the forward path is dead
on this toolchain.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/probe_forward_ladder.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import config as config_lib
from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.ops.forward_laplacian import (forward_laplacian,
                                             make_forward_kinetic)
from aiqmc_tpu.hamiltonian.kinetic import local_kinetic_energy
from aiqmc_tpu.sampling.init_electrons import init_electrons
from aiqmc_tpu.train import _build_network
from aiqmc_tpu.configs import c_atom_ccecp

cfg = c_atom_ccecp.get_config()
with cfg.unlocked():
    cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
    cfg.network.hidden_dims = ((32, 16),) * 3
    cfg.network.hidden_dims_ynlm = (8, 8, 8)
    cfg.network.determinants = 4
cfg = config_lib.resolve(cfg)
network, _ = _build_network(cfg)

key = jax.random.PRNGKey(0)
params = network.init(key)
atoms = jnp.asarray(cfg.system.atoms)
charges = jnp.asarray(cfg.system.charges)
spins = jnp.asarray(cfg.system.spins)
batch = 64
pos, spins_b = init_electrons(key, None, atoms, charges, spins,
                              batch_size=batch, init_width=1.0)
pos = np.asarray(pos)
x0 = jnp.asarray(pos[0])
n = x0.shape[0]

data0 = AINetData(positions=x0, spins=spins_b[0], atoms=atoms,
                  charges=charges)


def orb_fn(x):
    return network.orbitals(params, x, spins_b[0], atoms, charges)[0]


results = {}


def report(name, diff, scale):
    ok = diff < 5e-4 * max(scale, 1.0)
    results[name] = ok
    print("%s: max|diff| = %.3e (scale %.3e) -> %s"
          % (name, diff, scale, "PASS" if ok else "FAIL"))


# --- A: values through the interpreter --------------------------------------
def interp_value(x):
    return forward_laplacian(orb_fn)(x).x

a = np.asarray(jax.jit(interp_value)(x0))
ref = np.asarray(jax.jit(orb_fn)(x0))
report("A value", np.abs(a - ref).max(), np.abs(ref).max())

# --- B: jacobian -------------------------------------------------------------
def interp_jac(x):
    return forward_laplacian(orb_fn)(x).jac

jac = np.asarray(jax.jit(interp_jac)(x0))
jac_ref = np.asarray(jax.jit(jax.jacfwd(orb_fn))(x0))
jac_ref = np.moveaxis(jac_ref, -1, 0)
report("B jacobian", np.abs(jac - jac_ref).max(), np.abs(jac_ref).max())

# --- C: laplacian vs exact Hessian trace -------------------------------------
def interp_lap(x):
    return forward_laplacian(orb_fn)(x).lap

lap = np.asarray(jax.jit(interp_lap)(x0))
hess = np.asarray(jax.jit(jax.hessian(orb_fn))(x0))
lap_ref = np.trace(hess, axis1=-2, axis2=-1)
report("C laplacian", np.abs(lap - lap_ref).max(), np.abs(lap_ref).max())

# --- D/E/F: full kinetic forward vs batched-tangent --------------------------
kin_fwd = make_forward_kinetic(network.orbitals)
kin_def = local_kinetic_energy(network.apply, complex_output=False)

in_axes = (None, AINetData(positions=0, spins=None, atoms=None, charges=None))
data_b = AINetData(positions=jnp.asarray(pos), spins=spins_b[0], atoms=atoms,
                   charges=charges)

d_fwd = float(jax.jit(kin_fwd)(params, data0))
d_def = float(jax.jit(kin_def)(params, data0))
report("D kinetic x1", abs(d_fwd - d_def), abs(d_def))

e_fwd = np.asarray(jax.jit(jax.vmap(kin_fwd, in_axes=in_axes))(params, data_b))
e_def = np.asarray(jax.jit(jax.vmap(kin_def, in_axes=in_axes))(params, data_b))
report("E kinetic vmap64", np.abs(e_fwd - e_def).max(), np.abs(e_def).max())


def kin_chunked(params, data):
    xs = data.positions.reshape(8, 8, n)

    def one_chunk(xc):
        return jax.vmap(lambda x: kin_fwd(
            params, AINetData(positions=x, spins=data.spins, atoms=data.atoms,
                              charges=data.charges)))(xc)

    return jax.lax.map(one_chunk, xs).reshape(-1)

f_fwd = np.asarray(jax.jit(kin_chunked)(params, data_b))
report("F kinetic map8x8", np.abs(f_fwd - e_def).max(), np.abs(e_def).max())

print()
if all(results.values()):
    print("LADDER PASS: forward Laplacian healthy on this backend.")
else:
    failed = [k for k, ok in results.items() if not ok]
    print("LADDER FAIL at: %s (first failing rung localizes the miscompile)"
          % ", ".join(failed))
