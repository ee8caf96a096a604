"""aiqmc_tpu: TPU-native neural-network Quantum Monte Carlo.

A from-scratch JAX/XLA (GSPMD + Pallas) framework with the capabilities of the
reference AIQMCrelease3 tree (FermiNet-style Y_nlm wavefunction, VMC, DMC, ccECP
pseudopotentials, correlated samples, PBC/Ewald), designed TPU-first:

- Walker batches are sharded over a ``jax.sharding.Mesh`` ('data' axis over ICI);
  collectives are inserted by XLA from sharding annotations (no pmap).
- Hot inner loops (Laplacian coordinates, nonlocal-ECP quadrature points) are
  batched into single large network evaluations that tile onto the MXU instead of
  sequential ``lax.fori_loop``s.

Reference layer map: see SURVEY.md at the repository root.
"""

__version__ = "0.1.0"

import os as _os

# QMC local energies are condition-number-amplified through determinant tails,
# so the TPU's DEFAULT bf16-truncated f32 matmuls are NOT precision-safe here:
# on the 2026-08-18 axon stack they moved a trained diamond-twist plateau by
# 0.37 Ha and produced pointwise E_L errors of tens of Ha near nodes
# (scripts/probe_chip_bisect.py: a plain tanh-dense stack already differs from
# CPU by 4e-2 at default precision and 2e-4 at highest). Round-1 bench
# variants showed precision is ~free on this latency-bound workload (bf16 was
# only +2%), so default every dot to HIGHEST; kernels that explicitly pass a
# jax.lax.Precision (e.g. optim/spring.py) are unaffected. Opt out with
# AIQMC_MATMUL_PRECISION=default (or any other jax precision name).
_prec = _os.environ.get("AIQMC_MATMUL_PRECISION", "highest")
if _prec and _prec != "default":
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision", _prec)
