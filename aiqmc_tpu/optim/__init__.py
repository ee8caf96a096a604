"""Optimizers: optax-based Adam step and (native) KFAC."""
