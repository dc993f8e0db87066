"""Reproducible RNG streams matching the reference seed schedule.

The reference derives one independent PCG64 stream per (base_seed, T, run)
via ``SeedSequence([base_seed, T, run])`` (algorithms.py:177-180, duplicated
at fast_algorithms.py:254-257), and experiment drivers derive per-run seeds
as ``base_seed + 2025 * (run + 1)`` (driver.py:88).  Reproducing these
schedules bit-for-bit is what lets the parity tests compare trajectories at
1e-6 against the reference's Numba semantics.
"""

from __future__ import annotations

import numpy as np


def rng_stream(base_seed: int, T: int, run: int) -> np.random.Generator:
    """Independent reproducible PCG64 stream per (base_seed, T, run)."""
    ss = np.random.SeedSequence([base_seed, T, run])
    return np.random.Generator(np.random.PCG64(ss))


def run_seed_schedule(base_seed: int, run: int) -> int:
    """Per-run stream seed used by the experiment drivers (driver.py:88)."""
    return base_seed + 2025 * (run + 1)
