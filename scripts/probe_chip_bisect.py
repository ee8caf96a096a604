"""Chip-vs-CPU bisect of the corrupted forward pass (2026-08-18 toolchain).

probe_el_cross_device.py showed this box's chip computes materially wrong
log|psi| (0.77 absolute), SIGNS (flips), and E_L (90 Ha) vs the pinned-CPU
reference on identical inputs. This probe compares the pipeline's
intermediates chip-vs-CPU to localize the miscompiled op:

  mlp        a plain dense tanh stack (sanity: basic matmul/elementwise)
  ge_slogdet ops.slogdet.slogdet — the unrolled one-hot-pivot GE (suspect)
  lu_slogdet jnp.linalg.slogdet on the same matrices (workaround candidate)
  ge_inv     ops.slogdet.inv
  pair_ge    ops.slogdet.slogdet_pair on (re, im) pairs
  orbitals   network.orbitals (everything BEFORE the determinant tail)
  apply      network.apply (the full wavefunction)

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/probe_chip_bisect.py
"""
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")


def compute():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aiqmc_tpu import config as config_lib
    from aiqmc_tpu.ops import slogdet as fast_slogdet
    from aiqmc_tpu.sampling.init_electrons import init_electrons
    from aiqmc_tpu.models.network import AINetData
    from aiqmc_tpu.train import _build_network
    from aiqmc_tpu.configs import c_atom_ccecp

    out = {}
    key = jax.random.PRNGKey(7)

    # mlp: basic dense stack.
    ws = [jax.random.normal(jax.random.fold_in(key, i), (64, 64)) * 0.2
          for i in range(6)]
    x = jax.random.normal(jax.random.fold_in(key, 99), (128, 64))

    def mlp(x):
        for w in ws:
            x = jnp.tanh(x @ w)
        return x

    out["mlp"] = np.asarray(jax.jit(mlp)(x))

    # Batched tiny matrices like the determinant tail sees: (batch, ndet, n, n)
    a = jax.random.normal(jax.random.fold_in(key, 1), (64, 4, 4, 4))
    ai = jax.random.normal(jax.random.fold_in(key, 2), (64, 4, 4, 4))

    s, l = jax.jit(fast_slogdet.slogdet)(a)
    out["ge_slogdet_sign"], out["ge_slogdet_log"] = np.asarray(s), np.asarray(l)
    s2, l2 = jax.jit(jnp.linalg.slogdet)(a)
    out["lu_slogdet_sign"], out["lu_slogdet_log"] = np.asarray(s2), np.asarray(l2)
    out["ge_inv"] = np.asarray(jax.jit(fast_slogdet.inv)(a))
    c, sn, lp = jax.jit(fast_slogdet.slogdet_pair)(a, ai)
    out["pair_ge_cos"], out["pair_ge_sin"], out["pair_ge_log"] = (
        np.asarray(c), np.asarray(sn), np.asarray(lp))

    # Network intermediates on the real C ccECP probe config.
    cfg = c_atom_ccecp.get_config()
    with cfg.unlocked():
        cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
        cfg.network.hidden_dims = ((32, 16),) * 3
        cfg.network.hidden_dims_ynlm = (8, 8, 8)
        cfg.network.determinants = 4
    cfg = config_lib.resolve(cfg)
    network, _ = _build_network(cfg)
    params = network.init(jax.random.PRNGKey(0))
    atoms = jnp.asarray(cfg.system.atoms)
    charges = jnp.asarray(cfg.system.charges)
    spins = jnp.asarray(cfg.system.spins)
    pos, spins_b = init_electrons(jax.random.PRNGKey(0), None, atoms, charges,
                                  spins, batch_size=32, init_width=1.0)

    orb = jax.jit(jax.vmap(
        lambda p: network.orbitals(params, p, spins_b, atoms, charges)[0]))(pos)
    out["orbitals"] = np.asarray(orb)
    sgn, logabs = jax.jit(jax.vmap(
        network.apply, in_axes=(None, 0, None, None, None)))(
            params, pos, spins_b, atoms, charges)
    out["apply_sign"], out["apply_log"] = np.asarray(sgn), np.asarray(logabs)
    return out


def main():
    import numpy as np
    if os.environ.get("_BISECT_WORKER"):
        np.savez(os.environ["_BISECT_OUT"], **compute())
        return
    here = compute()
    env = dict(os.environ)
    env.update(_BISECT_WORKER="1", _BISECT_OUT="/tmp/chip_bisect.npz",
               JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=env, capture_output=True, text=True, timeout=2400)
    if r.returncode != 0:
        print("CPU worker failed:", r.stderr[-1500:])
        return
    ref = np.load("/tmp/chip_bisect.npz")
    for k in ref.files:
        a, b = np.asarray(here[k], np.float64), np.asarray(ref[k], np.float64)
        d = np.abs(a - b).max()
        scale = max(float(np.abs(b).max()), 1.0)
        verdict = "PASS" if d < 1e-3 * scale else "FAIL"
        print("%-16s max|chip-cpu| = %.3e (scale %.3e) -> %s"
              % (k, d, scale, verdict))


if __name__ == "__main__":
    main()
