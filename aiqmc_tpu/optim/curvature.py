"""Curvature-registration hooks.

The reference registers its loss output with kfac_jax
(``kfac_jax.register_normal_predictive_distribution``, ref Loss/loss.py:260-266)
so the KFAC optimizer can identify the predictive distribution. kfac_jax is not
available in this environment; the native KFAC implementation in
``aiqmc_tpu.optim.kfac`` does not rely on jaxpr tagging (it instruments the
layers directly), so this hook is a no-op kept for call-site parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def register_normal_predictive_distribution(mean: jnp.ndarray) -> jnp.ndarray:
    """No-op stand-in for kfac_jax.register_normal_predictive_distribution."""
    return mean
