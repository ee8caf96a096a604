"""Test harness: run on 8 virtual CPU devices.

This is the TPU-era version of the reference's multi-device test recipe
(``chex.set_n_cpu_devices`` driven by FERMINET_CHEX_N_CPU_DEVICES,
ref ferminet/tests/train_test.py:36-49): sharding/pjit code paths are exercised
on a virtual 8-device host mesh in one process. The axon TPU plugin registers
itself in sitecustomize, so the platform is switched back to CPU via jax.config
before any backend initialises.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
