"""Diffusion Monte Carlo engine (ref AIQMCrelease3/DMC/*)."""
