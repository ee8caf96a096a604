"""Precision-pin throughput A/B on the bench workload (VERDICT r2 item 4).

The package pins jax_default_matmul_precision=highest at import (mandatory
for correct physics: the 2026-08-18 bf16-default incident — BASELINE.md).
This measures exactly what the pin costs on the CURRENT box by timing the
bench step (C ccECP, batch 4096, dd sweeps + Adam + forward Laplacian) in two
subprocesses:

  arm A: the pin (production default);
  arm B: AIQMC_MATMUL_PRECISION=default — TIMING ONLY; its physics is the
         corrupted configuration and is never trusted or recorded as a
         result.

Decision rule: cost <= ~3% -> the pin is irreducible noise-level, close the
item with a writeup (the round-1 variants row already showed bf16 feature
matmuls move the tiny-matmul workload only ~2%); cost >> 3% -> selective
precision work is worth chip time.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/probe_precision_ab.py
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys
sys.path.insert(0, %r)
import bench
rate, loss = bench.measure(bench.BATCH, bench.WARMUP_ITERS,
                           bench.TIMED_ITERS, laplacian="forward")
print("CHILD_RESULT " + json.dumps({"rate": rate, "loss": loss}))
""" % (HERE,)


def run_arm(name, extra_env):
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra_env)
    proc = subprocess.run([sys.executable, "-c", CHILD], env=env,
                          capture_output=True, text=True, timeout=3000)
    for line in proc.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            rec = json.loads(line[len("CHILD_RESULT "):])
            print(f"arm {name}: {rec['rate']:,.0f} walker-steps/s/chip "
                  f"(loss {rec['loss']:.4f})")
            return rec["rate"]
    print(f"arm {name} FAILED rc={proc.returncode}:\n{proc.stderr[-1500:]}")
    return None


def main():
    pinned = run_arm("pinned (production)", {})
    unpinned = run_arm("default-precision (timing only, physics INVALID)",
                       {"AIQMC_MATMUL_PRECISION": "default"})
    # Arm C: SELECTIVE — the global pin stays (trusted physics for every
    # forward value), but the forward-Laplacian TANGENT-propagation dots
    # (the ndirs-wide Jacobian/Laplacian contractions, the FLOPs-heavy part
    # of the kinetic) run at default precision. If C recovers most of the
    # A->B gap it becomes a production candidate, gated by the cross-device
    # oracle + both forward probes run WITH the variable set.
    selective = run_arm("selective (pin + tangent dots default)",
                        {"AIQMC_FWDLAP_TANGENT_PRECISION": "default"})
    if pinned and unpinned:
        cost = (unpinned - pinned) / unpinned * 100.0
        print(f"pin cost on this box: {cost:.1f}% "
              f"({unpinned:,.0f} -> {pinned:,.0f})")
        if selective:
            rec = (selective - pinned) / max(1.0, unpinned - pinned) * 100.0
            print(f"selective arm recovers {rec:.0f}% of the pin cost "
                  f"({pinned:,.0f} -> {selective:,.0f})")
        print("VERDICT:", "PIN_IRREDUCIBLE_NOISE" if cost <= 3.0
              else "SELECTIVE_PRECISION_WORTH_PURSUING")


if __name__ == "__main__":
    main()
