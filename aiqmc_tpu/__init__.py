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
