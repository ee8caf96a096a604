"""Wavefunction sanity diagnostics.

Automates the verification protocol's manual checks (.claude/skills/verify):
a normalisable ansatz must have log|psi| falling as an electron is pulled far
from every nucleus. A flat (or rising) tail — e.g. the reference's unbounded
envelope defect (ref wavefunction_Ynlm/envelope.py, fixed behind
``bounded_envelope``) — makes walkers ionise and the energy trend to 0, which
looks like "great progress" in the CSV until it crosses the variational bound.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.models.network import AINetData


def logpsi_decay_profile(logabs_network, params, data: AINetData,
                         radii: Sequence[float] = (5.0, 10.0, 20.0, 50.0),
                         electron: int = 0,
                         direction=(1.0, 0.0, 0.0),
                         ndim: int = 3) -> np.ndarray:
    """log|psi| with one electron pulled to each radius (others fixed).

    Args:
      logabs_network: (params, pos, spins, atoms, charges) -> log|psi|.
      data: ONE configuration (unbatched positions (nelec*ndim,)); the probe
        electron is moved to ``radius * direction`` from the first atom.
    Returns: array of log|psi| values, one per radius.
    """
    direction = np.asarray(direction, dtype=float)
    direction = direction / np.linalg.norm(direction)
    base = np.asarray(data.positions, dtype=float).copy()
    origin = np.asarray(data.atoms, dtype=float)[0]
    out = []
    for r in radii:
        pos = base.copy()
        pos[electron * ndim:(electron + 1) * ndim] = origin + r * direction
        out.append(float(logabs_network(
            params, jnp.asarray(pos, dtype=jnp.asarray(data.positions).dtype),
            data.spins, data.atoms, data.charges)))
    return np.asarray(out)


def check_normalisable(logabs_network, params, data: AINetData,
                       radii: Sequence[float] = (5.0, 10.0, 20.0, 50.0),
                       min_drop_per_bohr: float = 0.05,
                       ndim: int = 3) -> Tuple[bool, np.ndarray]:
    """(ok, profile): ok=True when log|psi| falls monotonically with radius
    at an average slope steeper than ``min_drop_per_bohr`` over the tail —
    the one-call form of the verify protocol's decay check. Checks every
    electron's ray (any single non-decaying channel ionises the walker)."""
    nelec = np.asarray(data.positions).size // ndim
    # One jitted vmapped evaluation over all (electron, radius) probes: the
    # per-probe eager loop dispatched every primitive individually, which on
    # a remote TPU backend added minutes of startup latency per training leg.
    base = np.asarray(data.positions, dtype=float)
    origin = np.asarray(data.atoms, dtype=float)[0]
    direction = np.array([1.0, 0.0, 0.0])
    probes = []
    for e in range(nelec):
        for r in radii:
            pos = base.copy()
            pos[e * ndim:(e + 1) * ndim] = origin + r * direction
            probes.append(pos)
    dtype = jnp.asarray(data.positions).dtype
    batched = jax.jit(jax.vmap(
        lambda pos: logabs_network(params, pos, data.spins, data.atoms,
                                   data.charges)))
    prof = np.asarray(batched(jnp.asarray(np.stack(probes), dtype=dtype)))
    prof = prof.reshape(nelec, len(radii))
    drops = -np.diff(prof, axis=1) / np.diff(np.asarray(radii, dtype=float))
    ok = bool(np.all(drops > min_drop_per_bohr))
    return ok, prof


# ---------------------------------------------------------------------------
# Backend trust gate (cross-device local-energy oracle)
# ---------------------------------------------------------------------------
#
# 2026-08-18 lesson: a TPU backend can compute a DEGRADED wavefunction without
# any error signal — that box's default bf16-truncated matmuls shifted
# log|psi| by ~0.8, flipped signs, and moved a trained twist plateau by
# 0.37 Ha, while every same-backend probe (forward vs batched-tangent
# Laplacian) "passed" because both paths degraded together. The only check
# that caught it compared the launch backend against a pinned-CPU subprocess
# on IDENTICAL inputs (jax.random differs ~3e-5 across backends, so inputs
# must be generated once and shared). Run this before trusting any physics
# produced on a new machine/toolchain; chip queues gate on it.

def _xdev_build(mode: str):
    import numpy as np  # noqa: F811 (lazy to keep module import light)

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
    elif mode == "pair":
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
    else:
        raise ValueError(f"unknown cross-device mode {mode!r}")
    cfg = config_lib.resolve(cfg)
    network, _ = _build_network(cfg)
    return cfg, network, _build_local_energy(cfg, network)


def _xdev_compute(mode: str, batch: int, inputs=None):
    """Evaluate log|psi|, phase/sign, E_L on the CURRENT backend.

    inputs=None generates (positions, spins, params) and returns them so a
    second backend can recompute from the very same bytes.
    """
    import jax
    from flax import serialization

    from aiqmc_tpu.sampling.init_electrons import init_electrons

    cfg, network, e_l = _xdev_build(mode)
    params_template = network.init(jax.random.PRNGKey(0))
    atoms = jnp.asarray(cfg.system.atoms)
    charges = jnp.asarray(cfg.system.charges)
    spins = jnp.asarray(cfg.system.spins)
    if inputs is None:
        pos, spins_b = init_electrons(jax.random.PRNGKey(0), None, atoms,
                                      charges, spins, batch_size=batch,
                                      init_width=1.0)
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
    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    el = np.asarray(jax.jit(jax.vmap(
        lambda p, k, d: e_l(p, k, d)[0], in_axes=in_axes))(
            params, keys, data), dtype=np.float64)
    ph, logabs = jax.jit(jax.vmap(
        network.apply, in_axes=(None, 0, None, None, None)))(
            params, pos, spins_b, atoms, charges)
    return {"logabs": np.asarray(logabs), "ph": np.asarray(ph),
            "el": el}, inputs


def _xdev_compare(mode: str, here: dict, ref: dict, verbose: bool):
    """Distribution-gated comparison. The gate uses median/p90 (and the
    loss-mirroring CLIPPED batch mean for E_L), never the raw batch max:
    determinant tails amplify round-off without bound as a walker approaches
    a node, so the worst walker carries no backend-health information — the
    corruption signature is BULK disagreement."""
    ref_log = np.asarray(ref["logabs"], np.float64)
    med_log = float(np.median(ref_log))
    rows, ok = [], True

    def add(name, d, med_tol, p90_tol):
        nonlocal ok
        d = np.asarray(d, np.float64)
        med, p90, mx = (float(np.median(d)), float(np.percentile(d, 90)),
                        float(d.max()))
        worst = int(np.unravel_index(np.argmax(d), d.shape)[0])
        row_ok = med < med_tol and p90 < p90_tol
        ok &= row_ok
        rows.append(dict(name=name, median=med, p90=p90, max=mx,
                         med_tol=med_tol, p90_tol=p90_tol, ok=row_ok))
        if verbose:
            print("%s %-6s med %.2e (tol %.0e)  p90 %.2e (tol %.0e)  "
                  "max %.2e @w%d(node prox %+.1f) -> %s"
                  % (mode, name, med, med_tol, p90, p90_tol, mx, worst,
                     ref_log[worst] - med_log, "PASS" if row_ok else "FAIL"))

    add("logabs", np.abs(np.asarray(here["logabs"], np.float64) - ref_log),
        2e-3, 2e-2)
    d_ph = np.abs(np.asarray(here["ph"], np.float64)
                  - np.asarray(ref["ph"], np.float64))
    if mode == "pair":
        add("phase", np.minimum(d_ph, 2 * np.pi - d_ph), 2e-3, 2e-2)
    else:
        add("sign", d_ph, 1e-6, 1e-6)
    ref_el = np.asarray(ref["el"], np.float64)
    add("E_L", np.abs(np.asarray(here["el"], np.float64) - ref_el), 0.05, 0.5)

    center = np.median(ref_el, axis=0)
    dev = np.mean(np.abs(ref_el - center), axis=0)
    lo, hi = center - 5 * dev, center + 5 * dev
    d_mean = float(np.max(np.abs(
        np.mean(np.clip(np.asarray(here["el"], np.float64), lo, hi), axis=0)
        - np.mean(np.clip(ref_el, lo, hi), axis=0))))
    # Even after clipping, ONE amplified near-node walker moves a small-batch
    # mean by up to 5*MAD/batch — scale the tolerance so a couple of such
    # walkers pass at any batch size (bulk bias is caught by the E_L median
    # gate above regardless).
    batch_n = ref_el.shape[0]
    mean_tol = max(0.05, 10.0 * float(np.max(dev)) / batch_n)
    mean_ok = d_mean < mean_tol
    ok &= mean_ok
    rows.append(dict(name="clipped_mean_el", median=d_mean, p90=d_mean,
                     max=d_mean, med_tol=mean_tol, p90_tol=mean_tol,
                     ok=mean_ok))
    if verbose:
        print("%s clipped batch-mean E_L diff = %.3e Ha (tol %.0e) -> %s"
              % (mode, d_mean, mean_tol, "PASS" if mean_ok else "FAIL"))
    return bool(ok), rows


def cross_device_check(modes=("real", "pair"), batch: int = 32,
                       timeout: int = 2400, verbose: bool = True) -> dict:
    """Backend trust gate: does THIS backend reproduce CPU local energies?

    Spawns a pinned-CPU subprocess that generates inputs (walker positions,
    params, quadrature keys) AND reference outputs, then recomputes log|psi|,
    phase/sign, and E_L on the current backend from the identical bytes and
    compares with the distribution gate (see _xdev_compare).

    Returns {"ok": bool, "modes": {mode: [row dicts]}}. Call it at the top of
    any production campaign on a new machine/toolchain; a False verdict means
    every physics number this backend produces is untrustworthy (see the
    module comment for the 2026-08-18 incident this would have caught).
    """
    import os
    import subprocess
    import sys
    import tempfile

    report = {"ok": True, "modes": {}}
    for mode in modes:
        if verbose:
            # Progress markers matter operationally: watchdogs use stdout
            # staleness to tell a long remote compile from a wedged process
            # (cold-cache axon compiles exceed 10 min with zero output).
            print(f"{mode}: CPU reference worker starting", flush=True)
        out = tempfile.NamedTemporaryFile(suffix=f"_xdev_{mode}.npz",
                                          delete=False).name
        env = dict(os.environ)
        env.update(_AIQMC_XDEV_MODE=mode, _AIQMC_XDEV_OUT=out,
                   _AIQMC_XDEV_BATCH=str(batch), JAX_PLATFORMS="cpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
        r = subprocess.run(
            [sys.executable, "-m", "aiqmc_tpu.diagnostics"],
            env=env, capture_output=True, text=True, timeout=timeout)
        if r.returncode != 0:
            if verbose:
                print(f"{mode}: CPU reference worker FAILED rc={r.returncode}")
                print(r.stderr[-2000:])
            report["ok"] = False
            report["modes"][mode] = []
            continue
        ref = np.load(out)
        inputs = {k[3:]: ref[k] for k in ref.files if k.startswith("in_")}
        if verbose:
            print(f"{mode}: CPU reference done; compiling/evaluating on this "
                  "backend (cold remote compiles can take >10 min)",
                  flush=True)
        here, _ = _xdev_compute(mode, batch, inputs=inputs)
        ok, rows = _xdev_compare(mode, here, dict(ref), verbose)
        report["ok"] &= ok
        report["modes"][mode] = rows
    report["ok"] = bool(report["ok"])
    if verbose:
        print()
        print("CROSS-DEVICE %s" % (
            "PASS: this backend reproduces CPU local energies on identical "
            "inputs" if report["ok"] else
            "FAIL: this backend corrupts local energies — physics runs on it "
            "are untrustworthy"))
    return report


def _xdev_worker_main():
    """Subprocess entry (pinned-CPU reference side of cross_device_check)."""
    import os
    mode = os.environ["_AIQMC_XDEV_MODE"]
    batch = int(os.environ.get("_AIQMC_XDEV_BATCH", "32"))
    outputs, inputs = _xdev_compute(mode, batch)
    np.savez(os.environ["_AIQMC_XDEV_OUT"], **outputs,
             **{"in_" + k: v for k, v in inputs.items()})


if __name__ == "__main__":
    _xdev_worker_main()
