"""Wavefunction sanity diagnostics.

Automates the verification protocol's manual checks (.claude/skills/verify):
a normalisable ansatz must have log|psi| falling as an electron is pulled far
from every nucleus. A flat (or rising) tail — e.g. the reference's unbounded
envelope defect (ref wavefunction_Ynlm/envelope.py, fixed behind
``bounded_envelope``) — makes walkers ionise and the energy trend to 0, which
looks like "great progress" in the CSV until it crosses the variational bound.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from aiqmc_tpu.models.network import AINetData


def logpsi_decay_profile(logabs_network, params, data: AINetData,
                         radii: Sequence[float] = (5.0, 10.0, 20.0, 50.0),
                         electron: int = 0,
                         direction=(1.0, 0.0, 0.0),
                         ndim: int = 3) -> np.ndarray:
    """log|psi| with one electron pulled to each radius (others fixed).

    Args:
      logabs_network: (params, pos, spins, atoms, charges) -> log|psi|.
      data: ONE configuration (unbatched positions (nelec*ndim,)); the probe
        electron is moved to ``radius * direction`` from the first atom.
    Returns: array of log|psi| values, one per radius.
    """
    direction = np.asarray(direction, dtype=float)
    direction = direction / np.linalg.norm(direction)
    base = np.asarray(data.positions, dtype=float).copy()
    origin = np.asarray(data.atoms, dtype=float)[0]
    out = []
    for r in radii:
        pos = base.copy()
        pos[electron * ndim:(electron + 1) * ndim] = origin + r * direction
        out.append(float(logabs_network(
            params, jnp.asarray(pos, dtype=jnp.asarray(data.positions).dtype),
            data.spins, data.atoms, data.charges)))
    return np.asarray(out)


def check_normalisable(logabs_network, params, data: AINetData,
                       radii: Sequence[float] = (5.0, 10.0, 20.0, 50.0),
                       min_drop_per_bohr: float = 0.05,
                       ndim: int = 3) -> Tuple[bool, np.ndarray]:
    """(ok, profile): ok=True when log|psi| falls monotonically with radius
    at an average slope steeper than ``min_drop_per_bohr`` over the tail —
    the one-call form of the verify protocol's decay check. Checks every
    electron's ray (any single non-decaying channel ionises the walker)."""
    nelec = np.asarray(data.positions).size // ndim
    profiles = []
    ok = True
    for e in range(nelec):
        prof = logpsi_decay_profile(logabs_network, params, data, radii,
                                    electron=e, ndim=ndim)
        profiles.append(prof)
        drops = -np.diff(prof) / np.diff(np.asarray(radii, dtype=float))
        ok = ok and bool(np.all(drops > min_drop_per_bohr))
    return ok, np.stack(profiles)
