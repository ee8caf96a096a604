"""The package-level matmul-precision pin.

QMC local energies are condition-number-amplified through determinant tails;
on the 2026-08-18 axon toolchain the TPU default (bf16-truncated f32 dots)
corrupted log|psi| by ~0.8 and E_L by tens of Ha (scripts/probe_el_cross_device
FAIL wholesale; scripts/probe_chip_bisect localized it to plain dense stacks).
aiqmc_tpu/__init__.py therefore pins jax_default_matmul_precision=highest at
import, overridable via AIQMC_MATMUL_PRECISION. This guards the pin itself.
"""

import jax

import aiqmc_tpu  # noqa: F401  (the import applies the pin)


def test_default_matmul_precision_pinned():
    assert jax.config.jax_default_matmul_precision == "highest"


def test_dot_respects_pin():
    # On CPU the pin is a no-op numerically, but the config knob must at
    # least be consumable by lax (catches jax version renames of the flag).
    import jax.numpy as jnp

    a = jnp.ones((4, 4))
    out = jax.jit(lambda x: x @ x)(a)
    assert out.shape == (4, 4)
