"""Valence ECP-RHF: analytic integral oracles + Hamiltonian consistency.

The decisive test: the SCF energy must equal the Monte-Carlo expectation of
the SAME semilocal Hamiltonian (hamiltonian/pp_local_energy, itself validated
against exact quadrature in test_ecp.py) over the HF determinant.
"""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.configs import c_atom_ccecp as cfg_c
from aiqmc_tpu.utils import ecp_scf, gto


def _s_gaussian(alpha):
    n = (2 * alpha / np.pi) ** 0.75
    return gto.Primitive(center=np.zeros(3), lmn=(0, 0, 0),
                         exps=np.array([alpha]), coefs=np.array([n]))


def test_local_gaussian_integral_analytic():
    """<chi_s| c r^0 e^{-b r^2} |chi_s> = c (2a/(2a+b))^{3/2} analytically."""
    a, b, c = 1.3, 0.7, 2.5
    basis = [_s_gaussian(a)]
    # rn = 2 -> r^(n-2) = r^0
    h = ecp_scf.ecp_core_hamiltonian(
        basis, np.zeros((1, 3)), np.array([0.0]),
        rn_local=np.array([[2.0]]), local_coes=np.array([[c]]),
        local_exps=np.array([[b]]),
        rn_non_local=np.array([[[2.0]]]), non_local_coes=np.array([[[0.0]]]),
        non_local_exps=np.array([[[1.0]]]), list_l=0)
    T = gto.kinetic_matrix(basis)
    want = c * (2 * a / (2 * a + b)) ** 1.5
    np.testing.assert_allclose(h[0, 0] - T[0, 0], want, rtol=1e-6)


def test_nonlocal_projector_identities():
    """l=0 projector acts as identity on an s function; l=1 annihilates it."""
    a, b, c = 0.9, 0.5, 1.7
    basis = [_s_gaussian(a)]
    kwargs = dict(rn_local=np.array([[2.0]]), local_coes=np.array([[0.0]]),
                  local_exps=np.array([[1.0]]))
    T = gto.kinetic_matrix(basis)
    # l=0 channel only
    h0 = ecp_scf.ecp_core_hamiltonian(
        basis, np.zeros((1, 3)), np.array([0.0]),
        rn_non_local=np.array([[[2.0]]]), non_local_coes=np.array([[[c]]]),
        non_local_exps=np.array([[[b]]]), list_l=0, **kwargs)
    want = c * (2 * a / (2 * a + b)) ** 1.5   # = local integral of v_0
    np.testing.assert_allclose(h0[0, 0] - T[0, 0], want, rtol=1e-6)
    # l=1 channel only: must vanish on an s function
    h1 = ecp_scf.ecp_core_hamiltonian(
        basis, np.zeros((1, 3)), np.array([0.0]),
        rn_non_local=np.array([[[2.0], [2.0]]]),
        non_local_coes=np.array([[[0.0], [c]]]),
        non_local_exps=np.array([[[1.0], [b]]]), list_l=1, **kwargs)
    np.testing.assert_allclose(h1[0, 0] - T[0, 0], 0.0, atol=1e-10)


def test_c_ccecp_rhf_energy_matches_vmc_of_hf_determinant():
    """E_SCF == <Phi_HF| H_ECP |Phi_HF> via MC with the tested local energy."""
    rhf = ecp_scf.run_rhf_ecp(
        atoms=np.zeros((1, 3)), z_true=[6], z_eff=[4.0],
        rn_local=cfg_c.RN_LOCAL, local_coes=cfg_c.LOCAL_COES,
        local_exps=cfg_c.LOCAL_EXPS, rn_non_local=cfg_c.RN_NON_LOCAL,
        non_local_coes=cfg_c.NON_LOCAL_COES,
        non_local_exps=cfg_c.NON_LOCAL_EXPS, nelectrons=4, list_l=2)
    assert rhf.converged
    # sane range for 4 valence electrons (exact ccECP C: -5.43 Ha)
    assert -5.45 < rhf.energy < -4.0

    mo = jnp.asarray(rhf.mo_coeff[:, :2])
    basis = rhf.basis

    def signed_network(params, pos, spins, atoms, charges):
        del params, spins, atoms, charges
        x = pos.reshape(4, 3)
        phi = gto.eval_basis(basis, x) @ mo          # (4, 2)
        su, lu = jnp.linalg.slogdet(phi[:2])
        sd, ld = jnp.linalg.slogdet(phi[2:])
        return su * sd, lu + ld

    from aiqmc_tpu.hamiltonian import pp_local_energy
    el = pp_local_energy.local_energy(
        f=signed_network, lognetwork=None, charges=jnp.array([4.0]),
        nspins=(2, 2), rn_local=jnp.asarray(cfg_c.RN_LOCAL),
        local_coes=jnp.asarray(cfg_c.LOCAL_COES),
        local_exps=jnp.asarray(cfg_c.LOCAL_EXPS),
        rn_non_local=jnp.asarray(cfg_c.RN_NON_LOCAL),
        non_local_coes=jnp.asarray(cfg_c.NON_LOCAL_COES),
        non_local_exps=jnp.asarray(cfg_c.NON_LOCAL_EXPS),
        natoms=1, nelectrons=4, ndim=3, list_l=2)

    # Sample |Phi_HF|^2 with RW MH.
    batch = 2048
    key = jax.random.PRNGKey(0)
    pos = 1.5 * jax.random.normal(key, (batch, 12))
    logp = jax.vmap(lambda x: 2 * signed_network(None, x, None, None, None)[1])

    @jax.jit
    def chain(pos, key):
        def body(i, carry):
            pos, lp, key = carry
            key, k1, k2 = jax.random.split(key, 3)
            prop = pos + 0.35 * jax.random.normal(k1, pos.shape)
            lp_new = logp(prop)
            acc = jnp.log(jax.random.uniform(k2, lp.shape)) < lp_new - lp
            return (jnp.where(acc[:, None], prop, pos),
                    jnp.where(acc, lp_new, lp), key)
        lp = logp(pos)
        pos, _, _ = jax.lax.fori_loop(0, 400, body, (pos, lp, key))
        return pos

    pos = chain(pos, jax.random.fold_in(key, 1))
    from aiqmc_tpu.models.network import AINetData
    data = AINetData(positions=pos, spins=jnp.array([1., 1., -1., -1.]),
                     atoms=jnp.zeros((1, 3)), charges=jnp.array([4.0]))
    keys = jax.random.split(jax.random.fold_in(key, 2), batch)
    e_l, _ = jax.jit(jax.vmap(el, in_axes=(None, 0, AINetData(
        positions=0, spins=None, atoms=None, charges=None))))(None, keys, data)
    e_l = np.asarray(e_l)
    e_mc = e_l.mean()
    sem = e_l.std() / np.sqrt(batch)
    assert abs(e_mc - rhf.energy) < max(4 * sem, 0.02), (
        f"VMC {e_mc:.4f}+-{sem:.4f} vs SCF {rhf.energy:.4f}")
