"""Diagnose the C ccECP VMC plateau: component breakdown + outlier geometry.

Loads the kfac4 checkpoint (run_c_ccecp_kfac2.py config, jastrow_ae off),
re-equilibrates walkers on CPU, and reports:
  - <T>, <V_ee>, <V_loc>, <V_nl> and their per-sample distributions
  - E_L percentiles and the geometry of outliers (min r_ae, min r_ee, log|psi|)

Usage: env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= PYTHONPATH=/root/repo \
       python scripts/diag_c_kfac4.py [ckpt]
"""
import sys

import numpy as np

ckpt_file = sys.argv[1] if len(sys.argv) > 1 else (
    "/root/repo/runs/c_kfac4/qmcjax_ckpt_009999.npz")

import jax
import jax.numpy as jnp
import ml_collections

from aiqmc_tpu import checkpoint as ckpt_lib
from aiqmc_tpu import train as train_lib
from aiqmc_tpu.configs import c_atom_ccecp
from aiqmc_tpu.hamiltonian import coulomb, ecp
from aiqmc_tpu.hamiltonian.kinetic import local_kinetic_energy
from aiqmc_tpu.models.features import construct_input_features
from aiqmc_tpu.models.network import AINetData

cfg = c_atom_ccecp.get_config()
with cfg.unlocked():
    cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
    cfg.batch_size = 2048
    cfg.network.hidden_dims = ((128, 32),) * 4
    cfg.network.hidden_dims_ynlm = (16, 16, 16, 16)
    cfg.network.determinants = 8
    cfg.network.jastrow_ae = False

from aiqmc_tpu import config as config_lib
cfg = config_lib.resolve(cfg)
network, _ = train_lib._build_network(cfg)

target_params = network.init(jax.random.PRNGKey(0))
t, data, params, opt_state, _ = ckpt_lib.restore(ckpt_file,
                                              target_params=target_params)
print("restored step", t)
params = jax.tree.map(lambda x: np.asarray(x), params)

nelec, natoms, ndim = 4, 1, 3
atoms = jnp.zeros((1, 3))
charges = jnp.array([4.0])
spins = jnp.array([1.0, 1.0, 1.0, -1.0])
pp = cfg.system.pp

f = network.apply

# MCMC: fresh walkers, RW MH on CPU.
batch = 4096
key = jax.random.PRNGKey(7)
pos = 1.2 * jax.random.normal(key, (batch, nelec * ndim))
logabs = jax.vmap(lambda x: f(params, x, spins, atoms, charges)[1])


@jax.jit
def chain(pos, key, width, nsteps):
    def body(i, carry):
        pos, lp, key, acc_sum = carry
        key, k1, k2 = jax.random.split(key, 3)
        prop = pos + width * jax.random.normal(k1, pos.shape)
        lp_new = logabs(prop)
        acc = jnp.log(jax.random.uniform(k2, lp.shape)) < 2 * (lp_new - lp)
        return (jnp.where(acc[:, None], prop, pos),
                jnp.where(acc, lp_new, lp), key, acc_sum + acc.mean())
    lp = logabs(pos)
    pos, lp, _, acc = jax.lax.fori_loop(0, nsteps, body, (pos, lp, key, 0.0))
    return pos, acc / nsteps


pos, acc = chain(pos, jax.random.fold_in(key, 1), 0.3, 600)
print("burn-in acceptance", float(acc))

data = AINetData(positions=pos, spins=spins, atoms=atoms, charges=charges)

# Components.
ke_fn = local_kinetic_energy(f)
loc_fn = ecp.local_pp_energy(nelec, natoms, ndim, jnp.asarray(pp.rn_local),
                             jnp.asarray(pp.local_coes),
                             jnp.asarray(pp.local_exps))
nl_fn = ecp.make_nonlocal_pp_energy(
    signed_network=f, nelectrons=nelec, natoms=natoms, ndim=ndim,
    list_l=pp.list_l, rn_non_local=jnp.asarray(pp.rn_non_local),
    non_local_coefficient=jnp.asarray(pp.non_local_coes),
    non_local_exponent=jnp.asarray(pp.non_local_exps))


def one(x, k):
    d = AINetData(positions=x, spins=spins, atoms=atoms, charges=charges)
    _, _, r_ae, r_ee = construct_input_features(x, atoms)
    vee = coulomb.potential_electron_electron(r_ee)
    kin = ke_fn(params, d)
    vloc = jnp.sum(loc_fn(d))
    vnl = nl_fn(params, k, d)
    lp = f(params, x, spins, atoms, charges)[1]
    return kin, vee, vloc, vnl, jnp.min(r_ae), jnp.min(
        r_ee + 10 * jnp.eye(nelec)), lp


keys = jax.random.split(jax.random.fold_in(key, 2), batch)
kin, vee, vloc, vnl, min_rae, min_ree, lp = jax.jit(jax.vmap(one))(pos, keys)
kin, vee, vloc, vnl = map(np.asarray, (kin, vee, vloc, vnl))
min_rae, min_ree, lp = map(np.asarray, (min_rae, min_ree, lp))
el = kin + vee + vloc + vnl

sem = lambda x: x.std() / np.sqrt(len(x))
print(f"<T>     = {kin.mean():.5f} +- {sem(kin):.5f}")
print(f"<V_ee>  = {vee.mean():.5f} +- {sem(vee):.5f}")
print(f"<V_loc> = {vloc.mean():.5f} +- {sem(vloc):.5f}")
print(f"<V_nl>  = {vnl.mean():.5f} +- {sem(vnl):.5f}")
print(f"<E_L>   = {el.mean():.5f} +- {sem(el):.5f}  var {el.var():.4f}")
qs = [0, 0.1, 1, 5, 25, 50, 75, 95, 99, 99.9, 100]
print("E_L percentiles:")
for q, v in zip(qs, np.percentile(el, qs)):
    print(f"  {q:6.1f}%  {v:10.4f}")

# Outliers: top 20 |E_L - mean|.
idx = np.argsort(-np.abs(el - el.mean()))[:20]
print("\nworst samples: E_L, T, V_nl, min_rae, min_ree, log|psi|")
for i in idx:
    print(f"  {el[i]:10.3f} {kin[i]:10.3f} {vnl[i]:8.3f} "
          f"{min_rae[i]:7.3f} {min_ree[i]:7.3f} {lp[i]:8.3f}")

# Correlate tails with geometry.
tail = np.abs(el - el.mean()) > 3 * el.std()
print(f"\ntail fraction {tail.mean():.4f}; "
      f"tail min_rae median {np.median(min_rae[tail]) if tail.any() else -1:.3f} "
      f"vs all {np.median(min_rae):.3f}; "
      f"tail min_ree median {np.median(min_ree[tail]) if tail.any() else -1:.3f} "
      f"vs all {np.median(min_ree):.3f}; "
      f"tail log|psi| median {np.median(lp[tail]) if tail.any() else -1:.3f} "
      f"vs all {np.median(lp):.3f}")
