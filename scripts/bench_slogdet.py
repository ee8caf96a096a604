"""Microbenchmark: ops/slogdet GE vs jnp.linalg on batched tiny matrices.

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
       PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_slogdet.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.ops import slogdet as fast

BATCH = 4096
NDET = 4


def timeit(fn, *args, iters=20):
    fn(*args)[1].block_until_ready() if isinstance(fn(*args), tuple) else None
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters


print("platform:", jax.devices()[0].platform, jax.devices()[0].device_kind)
for n in (4, 8, 16):
    a = jnp.asarray(np.random.RandomState(n).normal(
        size=(BATCH, NDET, n, n)).astype(np.float32) + 2 * np.eye(n))
    f_ge = jax.jit(fast.slogdet)
    f_xla = jax.jit(jnp.linalg.slogdet)
    g_ge = jax.jit(jax.grad(lambda x: jnp.sum(fast.slogdet(x)[1])))
    g_xla = jax.jit(jax.grad(lambda x: jnp.sum(jnp.linalg.slogdet(x)[1])))
    i_ge = jax.jit(fast.inv)
    i_xla = jax.jit(jnp.linalg.inv)
    r = {}
    r["fwd"] = (timeit(f_xla, a), timeit(f_ge, a))
    r["grad"] = (timeit(g_xla, a), timeit(g_ge, a))
    r["inv"] = (timeit(i_xla, a), timeit(i_ge, a))
    for k, (t_x, t_g) in r.items():
        print(f"n={n:2d} {k:4s}: xla {t_x*1e3:7.3f} ms  ge {t_g*1e3:7.3f} ms "
              f" speedup {t_x/t_g:5.2f}x")
