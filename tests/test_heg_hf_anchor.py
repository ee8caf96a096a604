"""HEG internal oracle: the exact Gamma plane-wave determinant evaluated
through the Ewald-HEG local energy must reproduce the analytic Hartree-Fock
energy of the finite cell (8.49148 Ha for rs=1, N=14; Fraser et al., PRB 53,
1814 (1996) Madelung convention — the same formula `scripts/run_heg.py`
prints as its anchor).

This pins the whole periodic energy path for jellium — kinetic of Bloch
orbitals, Ewald e-e with neutralising background, Madelung self-term —
independently of any neural ansatz. It was built round 5 while diagnosing
the HEG flatline (the ansatz, not this energy path, was at fault).
"""

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu import pretrain
from aiqmc_tpu.configs import heg
from aiqmc_tpu.models.network import AINetData
from aiqmc_tpu.pbc import ewald

E_HF_EXACT = 8.49148  # printed by scripts/run_heg.py (rs=1, N=14, Gamma)


def test_planewave_determinant_reproduces_hf_energy():
    cfg = heg.get_config(rs=1.0, nelec=14)
    lattice = np.asarray(cfg.system.structure)
    cell = float(lattice[0, 0])
    targets = pretrain.make_planewave_targets(lattice, (7, 7))

    def f(params, pos, spins, atoms, charges):
        tu, td = targets(pos)
        s1, l1 = jnp.linalg.slogdet(tu)
        s2, l2 = jnp.linalg.slogdet(td)
        return s1 * s2, l1 + l2

    atoms = jnp.zeros((1, 3))
    charges = jnp.zeros((1,))
    spins = jnp.asarray([1.0] * 7 + [-1.0] * 7)
    e_l = ewald.local_energy(
        f=f, charges=charges, nspins=(7, 7), complex_output=False,
        lattice=jnp.asarray(lattice), heg=True, convergence_radius=5,
        laplacian_chunk=None, laplacian_method="default", orbitals_fn=None,
        twist_k=None, ndim=3, pair_output=False)

    batch = 256
    key = jax.random.PRNGKey(7)
    key, k = jax.random.split(key)
    pos = jax.random.uniform(k, (batch, 42), minval=0.0, maxval=cell)
    logabs = jax.jit(jax.vmap(lambda p: f(None, p, spins, atoms, charges)[1]))

    @jax.jit
    def sweep(pos, key):
        def body(_, carry):
            pos, key = carry
            key, k1, k2 = jax.random.split(key, 3)
            prop = pos + 0.35 * jax.random.normal(k1, pos.shape)
            ratio = 2.0 * (logabs(prop) - logabs(pos))
            acc = jnp.log(jax.random.uniform(k2, (batch,))) < ratio
            return jnp.where(acc[:, None], prop, pos), key
        return jax.lax.fori_loop(0, 60, body, (pos, key))

    for _ in range(4):  # |det|^2 burn-in
        pos, key = sweep(pos, key)

    el_v = jax.jit(jax.vmap(
        lambda kk, p: e_l(None, kk, AINetData(
            positions=p, spins=spins, atoms=atoms, charges=charges))[0]))
    samples = []
    for _ in range(4):
        key, kk = jax.random.split(key)
        samples.append(np.asarray(el_v(jax.random.split(kk, batch), pos)))
        pos, key = sweep(pos, key)
    es = np.concatenate(samples)
    es = es[np.isfinite(es)]
    assert len(es) > 900
    err = es.std() / np.sqrt(len(es))
    assert abs(es.mean() - E_HF_EXACT) < max(5 * err, 0.2), (
        f"plane-wave det E_L {es.mean():.4f} +- {err:.4f} vs HF {E_HF_EXACT}")
