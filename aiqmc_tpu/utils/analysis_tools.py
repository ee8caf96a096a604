"""Training-log analysis helpers.

Capability parity with ref ``ferminet/utils/analysis_tools.py:47-113``: load a
train_states.csv, report reblocked energy estimates and equilibration-aware
means (pandas-free; numpy + csv only).
"""

from __future__ import annotations

import csv
from typing import Dict, Optional

import numpy as np

from aiqmc_tpu.utils.statistics import blocked_error


def read_train_stats(path: str) -> Dict[str, np.ndarray]:
    """Reads a train_states.csv into {column: array} (non-numeric -> nan)."""
    with open(path) as f:
        rows = list(csv.DictReader(f))
    out = {}
    if not rows:
        return out
    for key in rows[0]:
        vals = []
        for r in rows:
            try:
                vals.append(float(r[key]))
            except (TypeError, ValueError):
                vals.append(np.nan)
        out[key] = np.asarray(vals)
    return out


def estimate_energy(path: str, burn_fraction: float = 0.2,
                    block_size: Optional[int] = None) -> Dict[str, float]:
    """Equilibration-discarded mean energy with reblocked error bars."""
    stats = read_train_stats(path)
    e = stats["energy"]
    e = e[np.isfinite(e)]
    tail = e[int(len(e) * burn_fraction):]
    return {
        "energy": float(tail.mean()),
        "stderr": blocked_error(tail, block_size),
        "sigma": float(tail.std()),
        "nsamples": int(tail.size),
    }
