"""Exponentially weighted running statistics.

Capability parity with ref ``ferminet/utils/statistics.py:26-58`` (used by the
upstream training loop to smooth the energy/variance trace,
ref ferminet/train.py:878-879).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class ExponentiallyWeightedStat:
    """EW mean/variance with bias correction."""
    decay: float = 0.99
    _mean: float = 0.0
    _var: float = 0.0
    _weight: float = 0.0

    def update(self, value: float) -> None:
        delta = value - self.mean if self._weight > 0 else 0.0
        self._weight = self.decay * self._weight + 1.0
        lr = 1.0 / self._weight
        self._mean = self._mean * (1 - lr) + value * lr if self._weight > 1 \
            else value
        self._var = (1 - lr) * (self._var + lr * delta ** 2) if self._weight > 1 \
            else 0.0

    @property
    def mean(self) -> float:
        return self._mean

    @property
    def variance(self) -> float:
        return self._var

    @property
    def std(self) -> float:
        return float(np.sqrt(max(self._var, 0.0)))


def blocked_error(values: np.ndarray, block_size: Optional[int] = None) -> float:
    """Blocked standard error of a correlated MC series (reblocking)."""
    values = np.asarray(values)
    n = values.size
    if block_size is None:
        block_size = max(1, n // 32)
    nblocks = n // block_size
    if nblocks < 2:
        return float(values.std() / np.sqrt(max(n, 1)))
    blocks = values[:nblocks * block_size].reshape(nblocks, block_size).mean(1)
    return float(blocks.std(ddof=1) / np.sqrt(nblocks))
