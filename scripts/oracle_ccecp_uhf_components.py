"""Decisive ECP-path oracle: componentwise <T>, <V_en+loc>, <V_nl>, <V_ee> of a
p-rich UHF(3,1) cc-pVDZ determinant — deterministic integrals vs Monte-Carlo
with the production sampled operators (hamiltonian/ecp.py + kinetic.py).

Background: all C ccECP VMC runs plateau at -5.25 Ha, ABOVE the ~-5.31 Ha a
good determinant reaches, while CH4 all-electron KFAC converges fine. If any
sampled ECP component is biased, this isolates which; if all match, the
Hamiltonian/sampler are vindicated and the ansatz/optimisation is at fault.

Usage: env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= PYTHONPATH=/root/repo \
       python -u scripts/oracle_ccecp_uhf_components.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from fci_ccecp_c import build_ccpvdz_basis

import jax
import jax.numpy as jnp

from aiqmc_tpu.configs import c_atom_ccecp as cc
from aiqmc_tpu.hamiltonian import coulomb, ecp
from aiqmc_tpu.hamiltonian.kinetic import local_kinetic_energy
from aiqmc_tpu.models.features import construct_input_features
from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.utils import ecp_scf, gto

atoms_np = np.zeros((1, 3))
basis = build_ccpvdz_basis()
nb = len(basis)
print("basis:", nb)

S = gto.overlap_matrix(basis)
T = gto.kinetic_matrix(basis)
Ven = gto.nuclear_matrix(basis, atoms_np, np.array([4.0]))
t0 = time.time()
hcore = ecp_scf.ecp_core_hamiltonian(
    basis, atoms_np, np.array([4.0]), cc.RN_LOCAL, cc.LOCAL_COES,
    cc.LOCAL_EXPS, cc.RN_NON_LOCAL, cc.NON_LOCAL_COES, cc.NON_LOCAL_EXPS,
    list_l=2)
hcore_nonl = ecp_scf.ecp_core_hamiltonian(
    basis, atoms_np, np.array([4.0]), cc.RN_LOCAL, cc.LOCAL_COES,
    cc.LOCAL_EXPS, cc.RN_NON_LOCAL, 0.0 * np.asarray(cc.NON_LOCAL_COES),
    cc.NON_LOCAL_EXPS, list_l=2)
Vnl_mat = hcore - hcore_nonl
Vlocg_mat = hcore_nonl - T - Ven
print("integrals done %.1fs" % (time.time() - t0))
eri = gto.eri_tensor(basis)
print("eri done")

# ---- UHF (3,1) ----
n_up, n_dn = 3, 1
evals, evecs = np.linalg.eigh(S)
X = evecs @ np.diag(evals ** -0.5) @ evecs.T


def density(C, n):
    Co = C[:, :n]
    return Co @ Co.T


def fock(gamma_tot, gamma_s):
    J = np.einsum("pqrs,rs->pq", eri, gamma_tot)
    K = np.einsum("prqs,rs->pq", eri, gamma_s)
    return J, K


# core guess
e0, C0 = np.linalg.eigh(X.T @ hcore @ X)
C_up = X @ C0
C_dn = X @ C0
E_old = 0.0
for it in range(300):
    g_up, g_dn = density(C_up, n_up), density(C_dn, n_dn)
    g_tot = g_up + g_dn
    J, K_up = fock(g_tot, g_up)
    _, K_dn = fock(g_tot, g_dn)
    F_up = hcore + J - K_up
    F_dn = hcore + J - K_dn
    E = 0.5 * (np.sum((hcore + F_up) * g_up) + np.sum((hcore + F_dn) * g_dn))
    _, C2u = np.linalg.eigh(X.T @ F_up @ X)
    _, C2d = np.linalg.eigh(X.T @ F_dn @ X)
    if abs(E - E_old) < 1e-10 and it > 5:
        break
    C_up, C_dn = X @ C2u, X @ C2d
    E_old = E
print(f"UHF(3,1) E = {E:.6f} Ha after {it} iters")

g_up, g_dn = density(C_up, n_up), density(C_dn, n_dn)
g_tot = g_up + g_dn
J, K_up = fock(g_tot, g_up)
_, K_dn = fock(g_tot, g_dn)
det_T = np.sum(T * g_tot)
det_Vloc = np.sum((Ven + Vlocg_mat) * g_tot)
det_Vnl = np.sum(Vnl_mat * g_tot)
det_Vee = 0.5 * (np.sum(J * g_tot) - np.sum(K_up * g_up)
                 - np.sum(K_dn * g_dn))
det_E = det_T + det_Vloc + det_Vnl + det_Vee
print(f"deterministic: T {det_T:.5f}  Vloc {det_Vloc:.5f}  "
      f"Vnl {det_Vnl:.5f}  Vee {det_Vee:.5f}  E {det_E:.5f}")

# ---- MC with production operators ----
nelec, natoms, ndim = 4, 1, 3
atoms = jnp.zeros((1, 3))
charges = jnp.array([4.0])
spins = jnp.array([1.0, 1.0, 1.0, -1.0])
mo_up = jnp.asarray(C_up[:, :n_up])
mo_dn = jnp.asarray(C_dn[:, :n_dn])


def signed_network(params, pos, sp, at, ch):
    del params, sp, at, ch
    x = pos.reshape(nelec, 3)
    chi = gto.eval_basis(basis, x)          # (4, nb)
    su, lu = jnp.linalg.slogdet(chi[:n_up] @ mo_up)
    sd, ld = jnp.linalg.slogdet(chi[n_up:] @ mo_dn)
    return su * sd, lu + ld


ke_fn = local_kinetic_energy(signed_network)
loc_fn = ecp.local_pp_energy(nelec, natoms, ndim, jnp.asarray(cc.RN_LOCAL),
                             jnp.asarray(cc.LOCAL_COES),
                             jnp.asarray(cc.LOCAL_EXPS))
nl_fn = ecp.make_nonlocal_pp_energy(
    signed_network=signed_network, nelectrons=nelec, natoms=natoms, ndim=ndim,
    list_l=2, rn_non_local=jnp.asarray(cc.RN_NON_LOCAL),
    non_local_coefficient=jnp.asarray(cc.NON_LOCAL_COES),
    non_local_exponent=jnp.asarray(cc.NON_LOCAL_EXPS))

logabs = jax.vmap(
    lambda x: signed_network(None, x, spins, atoms, charges)[1])


@jax.jit
def chain(pos, key, width, nsteps):
    def body(i, carry):
        pos, lp, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        prop = pos + width * jax.random.normal(k1, pos.shape)
        lp_new = logabs(prop)
        acc = jnp.log(jax.random.uniform(k2, lp.shape)) < 2 * (lp_new - lp)
        return (jnp.where(acc[:, None], prop, pos),
                jnp.where(acc, lp_new, lp), key)
    lp = logabs(pos)
    pos, _, _ = jax.lax.fori_loop(0, nsteps, body, (pos, lp, key))
    return pos


def one(x, k):
    d = AINetData(positions=x, spins=spins, atoms=atoms, charges=charges)
    _, _, _, r_ee = construct_input_features(x, atoms)
    return (ke_fn(None, d), coulomb.potential_electron_electron(r_ee),
            jnp.sum(loc_fn(d)), nl_fn(None, k, d))


eval_batch = jax.jit(jax.vmap(one))

batch = 4096
key = jax.random.PRNGKey(11)
pos = 1.2 * jax.random.normal(key, (batch, nelec * ndim))
pos = chain(pos, jax.random.fold_in(key, 0), 0.35, 800)

acc_k, acc_vee, acc_vloc, acc_vnl = [], [], [], []
rounds = 24
for r in range(rounds):
    pos = chain(pos, jax.random.fold_in(key, 100 + r), 0.35, 100)
    keys = jax.random.split(jax.random.fold_in(key, 1000 + r), batch)
    kin, vee, vloc, vnl = eval_batch(pos, keys)
    acc_k.append(np.asarray(kin))
    acc_vee.append(np.asarray(vee))
    acc_vloc.append(np.asarray(vloc))
    acc_vnl.append(np.asarray(vnl))
    if (r + 1) % 6 == 0:
        print(f"  round {r+1}/{rounds}")

kin = np.concatenate(acc_k)
vee = np.concatenate(acc_vee)
vloc = np.concatenate(acc_vloc)
vnl = np.concatenate(acc_vnl)
el = kin + vee + vloc + vnl
sem = lambda x: x.std() / np.sqrt(len(x) / 8)  # conservative: corr. samples


def row(name, mc, det):
    print(f"{name:6s} MC {mc.mean():9.5f} +- {sem(mc):7.5f}   "
          f"det {det:9.5f}   diff {(mc.mean()-det)*1000:+8.2f} mHa")


row("T", kin, det_T)
row("Vee", vee, det_Vee)
row("Vloc", vloc, det_Vloc)
row("Vnl", vnl, det_Vnl)
row("E", el, det_E)
