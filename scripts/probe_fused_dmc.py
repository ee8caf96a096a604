"""Probe for the axon-backend miscompile that forced the 3-program DMC step.

dmc/propagate.py:5-16 documents deterministic local-energy corruption when the
T-move + drift-diffusion + energy evaluation were fused into ONE program on
the round-1 toolchain. This probe re-tests after toolchain updates: it
evaluates the same positions' local energies (a) in a standalone jitted
program and (b) inside a fused program that first runs T-moves +
drift-diffusion and then evaluates BOTH position sets. If max|a-b| is at
float32 round-off, the fused single-program DMC step can be re-enabled for
lower dispatch overhead.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_fused_dmc.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import config as config_lib
from aiqmc_tpu.dmc.drift_diffusion import propose_drift_diffusion
from aiqmc_tpu.dmc.propagate import calculate_total_energy
from aiqmc_tpu.dmc.tmoves import compute_tmoves
from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.sampling.init_electrons import init_electrons
from aiqmc_tpu.train import _build_local_energy, _build_network
from aiqmc_tpu.configs import c_atom_ccecp

cfg = c_atom_ccecp.get_config()
with cfg.unlocked():
    cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
    cfg.network.hidden_dims = ((32, 16),) * 3
    cfg.network.hidden_dims_ynlm = (8, 8, 8)
    cfg.network.determinants = 4
    cfg.optim.laplacian = "forward"
cfg = config_lib.resolve(cfg)

network, _ = _build_network(cfg)
local_energy = _build_local_energy(cfg, network)
total_e = calculate_total_energy(local_energy)

key = jax.random.PRNGKey(0)
params = network.init(key)
atoms = jnp.asarray(cfg.system.atoms)
charges = jnp.asarray(cfg.system.charges)
spins = jnp.asarray(cfg.system.spins)
batch = 256
pos, spins_out = init_electrons(key, None, atoms, charges, spins,
                                batch_size=batch, init_width=1.0)
data = AINetData(positions=pos, spins=spins_out, atoms=atoms, charges=charges)

pp = cfg.system.pp
tstep = 0.02
tmove_fn = compute_tmoves(
    list_l=pp.list_l, tstep=tstep, nelectrons=4, natoms=1, ndim=3,
    signed_network=network.apply,
    Rn_non_local=jnp.asarray(pp.rn_non_local),
    Non_local_coes=jnp.asarray(pp.non_local_coes),
    Non_local_exps=jnp.asarray(pp.non_local_exps),
    quadrature=pp.get("quadrature", "msc50"))
dd_fn = propose_drift_diffusion(network.apply, tstep=tstep, ndim=3,
                                nelectrons=4, batch_size=batch)
batch_tmove = jax.vmap(tmove_fn,
                       in_axes=(AINetData(positions=0, spins=None, atoms=None,
                                          charges=None), None, 0))


def move(params, data, key):
    k1, k2 = jax.random.split(key)
    tkeys = jax.random.split(k1, batch)
    tm_pos, _ = batch_tmove(data, params, tkeys)
    tm_data = AINetData(positions=tm_pos, spins=data.spins, atoms=data.atoms,
                        charges=data.charges)
    new_data = dd_fn(params, k2, tm_data)[0]
    return new_data.positions


@jax.jit
def standalone_energy(params, key, data):
    return total_e(params, key, data)[0]


@jax.jit
def fused(params, key, data):
    k_move, k_e1, k_e2 = jax.random.split(key, 3)
    new_pos = move(params, data, k_move)
    e_old = total_e(params, k_e1, data)[0]
    new_data = AINetData(positions=new_pos, spins=data.spins, atoms=data.atoms,
                         charges=data.charges)
    e_new = total_e(params, k_e2, new_data)[0]
    return e_old, e_new, new_pos


key, sub = jax.random.split(key)
e_old_f, e_new_f, new_pos = fused(params, sub, data)
k_move, k_e1, k_e2 = jax.random.split(sub, 3)
e_old_s = standalone_energy(params, k_e1, data)
new_data = AINetData(positions=new_pos, spins=data.spins, atoms=data.atoms,
                     charges=data.charges)
e_new_s = standalone_energy(params, k_e2, new_data)

# Gate on the error DISTRIBUTION, not the batch max: fusing the programs
# changes XLA's rounding, and random-init walkers near nodes of the random
# network amplify round-off without bound (same lesson as
# probe_el_cross_device.py — a max-only gate mislabels a healthy backend).
# The miscompile signature is BULK disagreement.
ok = True
for label, a, b in [("pre-move ", e_old_f, e_old_s),
                    ("post-move", e_new_f, e_new_s)]:
    d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
    med, p90, mx = (float(np.median(d)), float(np.percentile(d, 90)),
                    float(d.max()))
    worst = int(np.argmax(d))
    stage_ok = med < 5e-3 and p90 < 5e-2
    ok &= stage_ok
    print("%s med %.2e (tol 5e-03)  p90 %.2e (tol 5e-02)  max %.2e "
          "@w%d(|E_L|=%.1f) -> %s"
          % (label, med, p90, mx, worst, abs(float(np.asarray(b)[worst])),
             "PASS" if stage_ok else "FAIL"))
if ok:
    print("PROBE PASS: fused program matches — single-program DMC step can be "
          "re-enabled")
else:
    print("PROBE FAIL: axon fused-program miscompile still present; keep the "
          "3-program split (dmc/propagate.py:5-16)")
