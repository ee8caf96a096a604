"""The driver's entry points must stay green (MULTICHIP_r01 regression).

Round 1 failed the driver's multi-chip check because ``dryrun_multichip``
didn't pin the platform and the axon TPU plugin claimed the backend. These
tests run it under the conftest's 8-virtual-CPU-device environment (in-process
fast path) so any regression in the entry points is caught in CI.
"""

import jax
import jax.numpy as jnp

import __graft_entry__


def test_dryrun_multichip_8_devices():
    assert jax.device_count() >= 8  # conftest forces 8 virtual CPU devices
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles_single_device():
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8,)
    assert bool(jnp.all(jnp.isfinite(out)))
