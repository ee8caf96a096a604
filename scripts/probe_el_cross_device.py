"""Cross-DEVICE local-energy oracle: chip vs CPU on identical inputs.

Every other chip probe compares two programs ON THE SAME BACKEND (forward vs
batched-tangent Laplacian), which cannot detect the batched-tangent path
itself miscompiling. This probe computes log|psi| (and phase) plus E_L for a
fixed (params, positions, quadrature keys) tuple twice — once on the backend
this process was launched with (the axon chip in production) and once in a
pinned-CPU subprocess — and compares pointwise. CPU is the trusted reference
(all physics unit tests run there).

Motivation (2026-08-18): the rebuilt diamond twist_a run plateaued 0.37 Ha
ABOVE its round-2 twin with identical script/seed — one of the two boxes is
computing corrupted pair local energies, and only a cross-device check can
say which paths on THIS box are sound.

Modes: real (C ccECP atom, batched-tangent Laplacian), pair (twisted diamond
ccECP, complex-pairs, batched-tangent pair kinetic).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/probe_el_cross_device.py [real|pair|both]
"""
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

BATCH = 32


def compute(mode):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aiqmc_tpu import config as config_lib
    from aiqmc_tpu.models.network import AINetData
    from aiqmc_tpu.sampling.init_electrons import init_electrons
    from aiqmc_tpu.train import _build_local_energy, _build_network

    if mode == "real":
        from aiqmc_tpu.configs import c_atom_ccecp
        cfg = c_atom_ccecp.get_config()
        with cfg.unlocked():
            cfg.system.spins = np.array([1.0, 1.0, 1.0, -1.0])
            cfg.network.hidden_dims = ((32, 16),) * 3
            cfg.network.hidden_dims_ynlm = (8, 8, 8)
            cfg.network.determinants = 4
            cfg.optim.laplacian = "default"
    else:
        from aiqmc_tpu.configs import diamond_ccecp
        cfg = diamond_ccecp.get_config()
        with cfg.unlocked():
            cfg.network.hidden_dims = ((16, 8),) * 2
            cfg.network.hidden_dims_ynlm = (8, 8)
            cfg.network.determinants = 2
            cfg.network.complex_orbitals = True
            cfg.network.complex_pairs = True
            cfg.network.pbc_smooth_r = True
            cfg.system.twist = (0.25, -0.25, 0.25)
            cfg.optim.laplacian = "default"
    cfg = config_lib.resolve(cfg)
    network, _ = _build_network(cfg)
    e_l = _build_local_energy(cfg, network)

    key = jax.random.PRNGKey(0)
    params = network.init(key)
    atoms = jnp.asarray(cfg.system.atoms)
    charges = jnp.asarray(cfg.system.charges)
    spins = jnp.asarray(cfg.system.spins)
    pos, spins_b = init_electrons(key, None, atoms, charges, spins,
                                  batch_size=BATCH, init_width=1.0)
    data = AINetData(positions=pos, spins=spins_b, atoms=atoms,
                     charges=charges)
    in_axes = (None, 0, AINetData(positions=0, spins=None, atoms=None,
                                  charges=None))
    keys = jax.random.split(jax.random.PRNGKey(1), BATCH)
    el = np.asarray(jax.jit(jax.vmap(
        lambda p, k, d: e_l(p, k, d)[0], in_axes=in_axes))(
            params, keys, data))
    sign_or_phase, logabs = jax.jit(jax.vmap(
        network.apply, in_axes=(None, 0, None, None, None)))(
            params, pos, spins_b[0] if spins_b.ndim > 1 else spins_b,
            atoms, charges)
    return (np.asarray(logabs), np.asarray(sign_or_phase),
            np.asarray(el, dtype=np.float64))


def main():
    modes_arg = sys.argv[1] if len(sys.argv) > 1 else "both"
    modes = ["real", "pair"] if modes_arg == "both" else [modes_arg]
    if os.environ.get("_EL_PROBE_WORKER"):
        import numpy as np
        mode = os.environ["_EL_PROBE_MODE"]
        out = os.environ["_EL_PROBE_OUT"]
        logabs, ph, el = compute(mode)
        np.savez(out, logabs=logabs, ph=ph, el=el)
        return

    import numpy as np
    all_ok = True
    for mode in modes:
        here = compute(mode)  # current backend (chip in production)
        env = dict(os.environ)
        env.update(_EL_PROBE_WORKER="1", _EL_PROBE_MODE=mode,
                   _EL_PROBE_OUT=f"/tmp/el_probe_{mode}.npz",
                   JAX_PLATFORMS="cpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        r = subprocess.run([sys.executable, os.path.abspath(__file__), mode],
                           env=env, capture_output=True, text=True,
                           timeout=1800)
        if r.returncode != 0:
            print(f"{mode}: CPU reference worker FAILED rc={r.returncode}")
            print(r.stderr[-2000:])
            all_ok = False
            continue
        ref = np.load(f"/tmp/el_probe_{mode}.npz")
        names = ["logabs", "phase/sign", "E_L"]
        vals = [(here[0], ref["logabs"]), (here[1], ref["ph"]),
                (here[2], ref["el"])]
        for name, (a, b) in zip(names, vals):
            d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
            scale = max(float(np.abs(b).max()), 1.0)
            tol = max(2e-3 * scale, 0.02) if name == "E_L" else 1e-3 * scale
            ok = bool(d.max() < tol)
            all_ok &= ok
            print("%s %s: max|chip-cpu| = %.3e (scale %.3e) -> %s"
                  % (mode, name, d.max(), scale, "PASS" if ok else "FAIL"))
    print()
    print("CROSS-DEVICE %s" % ("PASS: this backend's batched-tangent local "
                               "energies match CPU" if all_ok else
                               "FAIL: this backend corrupts local energies "
                               "— chip physics runs are untrustworthy"))


if __name__ == "__main__":
    main()
