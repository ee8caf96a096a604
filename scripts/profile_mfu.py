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
       PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_mfu.py \
       [--flagship] [--batch=N] [--trace]

--flagship profiles the PRODUCTION shape ((256,32)x4, ynlm 16x4, 16 dets,
upstream h-stream, KFAC, forward Laplacian) instead of the tiny cross-round
bench net (VERDICT round-4 item 8).
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


FLAGSHIP_OVERRIDES = {
    # The production workload every flagship chip-hour actually runs:
    # (256,32)x4 / ynlm 16x4 / 16 dets, upstream h-stream, KFAC, forward
    # Laplacian (scripts/run_c_ccecp_kfac_fstream.py defaults) — VERDICT
    # round-4 item 8 asked for MFU at this shape, not the tiny bench net.
    "network.hidden_dims": ((256, 32),) * 4,
    "network.hidden_dims_ynlm": (16, 16, 16, 16),
    "network.determinants": 16,
    "network.h_stream": "ferminet",
    "optim.optimizer": "kfac",
}


def main():
    trace = "--trace" in sys.argv
    flagship = "--flagship" in sys.argv
    batch = bench.BATCH
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
    overrides = FLAGSHIP_OVERRIDES if flagship else None
    if flagship:
        print(f"profiling FLAGSHIP shape (256,32)x4/16det kfac batch={batch}")
    jax_mod, step, params, opt_state, data = bench.build_step(
        batch, overrides=overrides)
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
        batch, 2, 10,
        prebuilt=(jax, step, params, opt_state, data), return_state=True)
    t_step = batch * bench.MCMC_STEPS / (
        steps_per_sec_per_chip * jax.device_count())

    achieved = flops / t_step
    print(f"step time            : {t_step*1e3:9.2f} ms")
    print(f"XLA-counted FLOPs    : {flops:.3e} /step")
    print(f"achieved             : {achieved/1e12:9.2f} TFLOP/s")
    print(f"MFU (fp32 peak 98.5T): {100*achieved/V5E_PEAK_F32:9.2f} %")
    print(f"MFU (bf16 peak 197T) : {100*achieved/V5E_PEAK_BF16:9.2f} %")
    walker_steps = batch * bench.MCMC_STEPS
    print(f"throughput           : {walker_steps/t_step:12.0f} walker-steps/s")

    if trace:
        with jax.profiler.trace("/tmp/mfu_trace"):
            out = step(params, opt_state, data, key, width)
            jax.block_until_ready(out)
        print("trace written to /tmp/mfu_trace")


if __name__ == "__main__":
    main()
