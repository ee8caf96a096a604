"""Cross-DEVICE local-energy oracle: chip vs CPU on IDENTICAL inputs.

Every other chip probe compares two programs ON THE SAME BACKEND (forward vs
batched-tangent Laplacian), which cannot detect the backend computing a
degraded function. This probe has a pinned-CPU subprocess generate the inputs
(params + walker positions + quadrature keys) AND the reference outputs, then
the launching backend (the axon chip in production) recomputes log|psi|,
phase/sign, and E_L from the very same bytes and compares pointwise.

Methodology note: inputs MUST be generated once and shared — jax.random
differs across backends at ~3e-5 (erf-inv arithmetic), and determinant tails
amplify that at ill-conditioned walkers (first version of this probe produced
spurious FAILs that way; /tmp/randn_check evidence in ROADMAP.md).

History (2026-08-18 box): at DEFAULT matmul precision the chip fails this
probe wholesale (bf16-truncated dots: a plain tanh stack is off by 4e-2,
trained twist plateaus moved 0.37 Ha). aiqmc_tpu now pins
jax_default_matmul_precision=highest at import; this probe is the gate that
proves the pin restores CPU-grade local energies on the live toolchain.

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


def build(mode):
    import numpy as np

    from aiqmc_tpu import config as config_lib
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
    return cfg, network, e_l


def compute(mode, inputs=None):
    """Returns (outputs dict, inputs dict). inputs=None generates them."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from aiqmc_tpu.models.network import AINetData
    from aiqmc_tpu.sampling.init_electrons import init_electrons

    cfg, network, e_l = build(mode)
    key = jax.random.PRNGKey(0)
    params_template = network.init(key)
    atoms = jnp.asarray(cfg.system.atoms)
    charges = jnp.asarray(cfg.system.charges)
    spins = jnp.asarray(cfg.system.spins)
    if inputs is None:
        pos, spins_b = init_electrons(key, None, atoms, charges, spins,
                                      batch_size=BATCH, init_width=1.0)
        params = params_template
        inputs = {
            "pos": np.asarray(pos),
            "spins_b": np.asarray(spins_b),
            "params_msgpack": np.frombuffer(
                serialization.to_bytes(jax.tree_util.tree_map(
                    np.asarray, params)), dtype=np.uint8),
        }
    else:
        pos = jnp.asarray(inputs["pos"])
        spins_b = jnp.asarray(inputs["spins_b"])
        params = serialization.from_bytes(
            params_template, np.asarray(inputs["params_msgpack"]).tobytes())

    data = AINetData(positions=pos, spins=spins_b, atoms=atoms,
                     charges=charges)
    in_axes = (None, 0, AINetData(positions=0, spins=None, atoms=None,
                                  charges=None))
    keys = jax.random.split(jax.random.PRNGKey(1), BATCH)
    el = np.asarray(jax.jit(jax.vmap(
        lambda p, k, d: e_l(p, k, d)[0], in_axes=in_axes))(
            params, keys, data), dtype=np.float64)
    sign_or_phase, logabs = jax.jit(jax.vmap(
        network.apply, in_axes=(None, 0, None, None, None)))(
            params, pos, spins_b, atoms, charges)
    outputs = {"logabs": np.asarray(logabs), "ph": np.asarray(sign_or_phase),
               "el": el}
    return outputs, inputs


def main():
    modes_arg = sys.argv[1] if len(sys.argv) > 1 else "both"
    modes = ["real", "pair"] if modes_arg == "both" else [modes_arg]
    if os.environ.get("_EL_PROBE_WORKER"):
        import numpy as np
        mode = os.environ["_EL_PROBE_MODE"]
        outputs, inputs = compute(mode)
        np.savez(os.environ["_EL_PROBE_OUT"], **outputs,
                 **{"in_" + k: v for k, v in inputs.items()})
        return

    import numpy as np
    all_ok = True
    for mode in modes:
        # CPU reference FIRST: it generates the shared inputs.
        env = dict(os.environ)
        env.update(_EL_PROBE_WORKER="1", _EL_PROBE_MODE=mode,
                   _EL_PROBE_OUT=f"/tmp/el_probe_{mode}.npz",
                   JAX_PLATFORMS="cpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        r = subprocess.run([sys.executable, os.path.abspath(__file__), mode],
                           env=env, capture_output=True, text=True,
                           timeout=2400)
        if r.returncode != 0:
            print(f"{mode}: CPU reference worker FAILED rc={r.returncode}")
            print(r.stderr[-2000:])
            all_ok = False
            continue
        ref = np.load(f"/tmp/el_probe_{mode}.npz")
        inputs = {k[3:]: ref[k] for k in ref.files if k.startswith("in_")}
        here, _ = compute(mode, inputs=inputs)
        np.savez(f"/tmp/el_probe_{mode}_here.npz", **here)

        # Gate on the error DISTRIBUTION, not the batch max. Two correct f32
        # backends differ at round-off in the orbital matrices, and the
        # determinant tail amplifies that without bound as a walker
        # approaches a node — so the worst walker in a batch carries no
        # information about backend health (the broken-toolchain signature
        # was BULK corruption: median logabs off by ~0.5 and flipped signs).
        # Criteria: medians at round-off-propagation level, p90 modest, and
        # the batch-mean E_L (what the loss actually consumes) tight.
        ref_log = np.asarray(ref["logabs"], np.float64)
        med_log = float(np.median(ref_log))
        checks = []  # (name, diffs, med_tol, p90_tol)
        d_log = np.abs(np.asarray(here["logabs"], np.float64) - ref_log)
        checks.append(("logabs", d_log, 2e-3, 2e-2))
        d_ph = np.abs(np.asarray(here["ph"], np.float64)
                      - np.asarray(ref["ph"], np.float64))
        if mode == "pair":  # angle output; wrap
            d_ph = np.minimum(d_ph, 2 * np.pi - d_ph)
            checks.append(("phase", d_ph, 2e-3, 2e-2))
        else:  # sign output: exact agreement required
            checks.append(("sign", d_ph, 1e-6, 1e-6))
        d_el = np.abs(np.asarray(here["el"], np.float64)
                      - np.asarray(ref["el"], np.float64))
        checks.append(("E_L", d_el, 0.05, 0.5))
        for name, d, med_tol, p90_tol in checks:
            med, p90, mx = (float(np.median(d)), float(np.percentile(d, 90)),
                            float(d.max()))
            ok = med < med_tol and p90 < p90_tol
            all_ok &= ok
            # d may be (batch,) or (batch, 2) for complex-pair E_L.
            worst = int(np.unravel_index(np.argmax(d), d.shape)[0])
            print("%s %-6s med %.2e (tol %.0e)  p90 %.2e (tol %.0e)  "
                  "max %.2e @w%d(node prox %+.1f) -> %s"
                  % (mode, name, med, med_tol, p90, p90_tol, mx, worst,
                     ref_log[worst] - med_log, "PASS" if ok else "FAIL"))
        # "What training sees": the loss clips E_L to median +- 5*MAD before
        # averaging, so compare CLIPPED batch means (a single near-node
        # walker otherwise dominates the raw mean — observed 1.84 Ha at a
        # walker 10.5 log-units below the median |psi|).
        ref_el = np.asarray(ref["el"], np.float64)  # (batch,) or (batch, 2)
        center = np.median(ref_el, axis=0)
        dev = np.mean(np.abs(ref_el - center), axis=0)
        lo, hi = center - 5 * dev, center + 5 * dev
        m_here = np.mean(np.clip(np.asarray(here["el"], np.float64), lo, hi),
                         axis=0)
        m_ref = np.mean(np.clip(ref_el, lo, hi), axis=0)
        d_mean = float(np.max(np.abs(m_here - m_ref)))
        ok = d_mean < 0.05
        all_ok &= ok
        print("%s clipped batch-mean E_L diff = %.3e Ha (tol 5e-02) -> %s"
              % (mode, d_mean, "PASS" if ok else "FAIL"))
    print()
    print("CROSS-DEVICE %s" % ("PASS: this backend reproduces CPU local "
                               "energies on identical inputs" if all_ok else
                               "FAIL: this backend corrupts local energies "
                               "— chip physics runs are untrustworthy"))


if __name__ == "__main__":
    main()
