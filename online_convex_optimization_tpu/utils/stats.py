"""Statistics helpers mirroring the reference's reporting conventions.

The reference reports mean regret +- 1.96 * SEM across runs, where each run
value is itself a mean over replicates (driver.py:59-63, 114-127).  Device
code reduces (n, sum, sum_sq) sufficient statistics instead of gathering
raw values; these helpers finish the job on host.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

CI_Z = 1.96  # 95% normal CI (driver.py:44)


def sem(x: np.ndarray) -> float:
    """Standard error of the mean with ddof=1 (driver.py:59-63)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n <= 1:
        return 0.0
    return float(np.std(x, ddof=1) / math.sqrt(n))


def mean_ci(x: Sequence[float], z: float = CI_Z):
    """(mean, z * SEM) across runs; CI is 0 for n <= 1 (driver.py:118-127)."""
    arr = np.asarray(list(x), dtype=np.float64)
    mu = float(np.mean(arr)) if arr.size else 0.0
    ci = z * sem(arr) if arr.size > 1 else 0.0
    return mu, ci


def merge_sufficient_stats(a, b):
    """Merge two (n, sum, sum_sq) triples — used when resuming sharded
    sweeps from checkpoints."""
    return tuple(np.asarray(a, dtype=np.float64) + np.asarray(b, dtype=np.float64))
