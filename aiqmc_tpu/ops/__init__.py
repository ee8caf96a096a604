"""Low-level TPU ops: Pallas kernels and their pure-JAX fallbacks."""
