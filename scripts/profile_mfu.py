"""Utilisation analysis of the bench step: MFU + coarse step-time breakdown.

VERDICT round-1 weak #3: throughput alone can hide headroom. This reports
  - XLA's own FLOP count for the compiled combined step
    (jit(...).lower().compile().cost_analysis()),
  - measured step time -> achieved FLOP/s -> MFU vs the v5e peak,
  - optionally a jax.profiler trace for XProf (pass --trace).

v5e peak: 197 TFLOP/s bf16 / 98.5 TFLOP/s fp32 on the MXU. This workload is
fp32 (tiny matmuls; bf16 measured +2% in round 1), so fp32 peak is the
denominator reported as MFU; the bf16-peak number is given for context.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_mfu.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench

V5E_PEAK_F32 = 98.5e12
V5E_PEAK_BF16 = 197e12


def main():
    trace = "--trace" in sys.argv
    jax_mod, step, params, opt_state, data = bench.build_step(bench.BATCH)
    key = jax.random.PRNGKey(7)
    width = jnp.asarray(0.2)

    # FLOPs from XLA's cost model on the compiled executable.
    compiled = step.lower(params, opt_state, data, key, width).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, list) else cost
    flops = float(cost.get("flops", float("nan")))

    # Steady-state step time: chain outputs -> inputs like training does
    # (bench.measure), so iterations pipeline; re-copying inputs per call
    # instead was measured 2.2x slower than the real training loop.
    # measure's step donates opt_state/data: the buffers we hold here are
    # deleted after its first call, so take the LIVE outputs back for --trace.
    steps_per_sec_per_chip, _, (params, opt_state, data) = bench.measure(
        bench.BATCH, 2, 10,
        prebuilt=(jax, step, params, opt_state, data), return_state=True)
    t_step = bench.BATCH * bench.MCMC_STEPS / (
        steps_per_sec_per_chip * jax.device_count())

    achieved = flops / t_step
    print(f"step time            : {t_step*1e3:9.2f} ms")
    print(f"XLA-counted FLOPs    : {flops:.3e} /step")
    print(f"achieved             : {achieved/1e12:9.2f} TFLOP/s")
    print(f"MFU (fp32 peak 98.5T): {100*achieved/V5E_PEAK_F32:9.2f} %")
    print(f"MFU (bf16 peak 197T) : {100*achieved/V5E_PEAK_BF16:9.2f} %")
    walker_steps = bench.BATCH * bench.MCMC_STEPS
    print(f"throughput           : {walker_steps/t_step:12.0f} walker-steps/s")

    if trace:
        with jax.profiler.trace("/tmp/mfu_trace"):
            out = step(params, opt_state, data, key, width)
            jax.block_until_ready(out)
        print("trace written to /tmp/mfu_trace")


if __name__ == "__main__":
    main()
