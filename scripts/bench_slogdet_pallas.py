"""Chip A/B: Pallas fused GE slogdet kernel vs the XLA batched-GE path.

Closes VERDICT round-2 item 7 ("spend or close the MFU finding"): the Pallas
variant (ops/slogdet.slogdet_pallas) has so far only run in interpret mode in
a test. This times both implementations on the production shapes (the hot
slogdet of the flagship/bench configs: batch x ndet tiny matrices) ON THE
CURRENT BACKEND and prints a machine-readable verdict line per shape plus an
overall PALLAS_{WINS,LOSES} token. The decision rule (README/BASELINE):
  * PALLAS_WINS on the production shapes -> flip models/blocks.slogdet's
    primal dispatch to the kernel;
  * PALLAS_LOSES -> delete the kernel and record "XLA batched GE is the
    final answer".

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python -u \
       scripts/bench_slogdet_pallas.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.ops import slogdet as sd

SHAPES = [
    (4096, 4, 4),    # bench config: batch 4096, 4 dets of n=4 (C ccECP)
    (2048, 16, 4),   # flagship: batch 2048, 16 dets, 4 valence electrons
    (2048, 16, 16),  # larger-molecule shape
    (4096, 16, 8),
]
REPS = 50


def _time(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS


def main():
    print("backend:", jax.devices()[0].platform, jax.devices()[0])
    wins = 0
    total = 0
    for batch, ndet, n in SHAPES:
        key = jax.random.PRNGKey(batch + ndet + n)
        a = jax.random.normal(key, (batch, ndet, n, n), dtype=jnp.float32)
        xla = jax.jit(lambda x: sd.slogdet(x))
        try:
            pal = jax.jit(lambda x: sd.slogdet_pallas(x))
            t_pal = _time(pal, a)
            s_p, l_p = pal(a)
        except Exception as e:  # Mosaic lowering failure etc.
            print(f"shape b{batch} d{ndet} n{n}: PALLAS_ERROR "
                  f"{type(e).__name__}: {str(e)[:200]}")
            total += 1
            continue
        t_xla = _time(xla, a)
        s_x, l_x = xla(a)
        ok = (np.allclose(np.asarray(l_p), np.asarray(l_x),
                          rtol=1e-5, atol=1e-5)
              and np.array_equal(np.asarray(s_p), np.asarray(s_x)))
        speedup = t_xla / t_pal
        total += 1
        wins += bool(ok and speedup > 1.05)
        print(f"shape b{batch} d{ndet} n{n}: xla {t_xla*1e6:9.1f}us  "
              f"pallas {t_pal*1e6:9.1f}us  speedup {speedup:5.2f}x  "
              f"values_match={ok}")
    print("VERDICT:", "PALLAS_WINS" if wins == total and total
          else "PALLAS_LOSES", f"({wins}/{total} shapes)")


if __name__ == "__main__":
    main()
