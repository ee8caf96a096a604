"""Periodic-boundary-condition support (ref AIQMCrelease3/PBC/* and
ferminet/pbc/*).

Convention: ``lattice`` is a (3, 3) matrix whose ROWS are the primitive lattice
vectors (matching the reference AIQMC `structure` arrays, e.g.
PBC/enforcePBC.py:9-11); fractional coordinates are x @ inv(lattice).
"""
