"""Timing and throughput measurement harness.

The reference has no profiling at all (SURVEY.md §5); the headline metric
for this framework is FTRL steps/s/chip (BASELINE.md).  ``measure`` gives a
block-until-ready wall-clock with warmup (so compile time is excluded), and
``trace`` wraps ``jax.profiler`` for XPlane/Perfetto dumps.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable

import jax


@dataclass(frozen=True)
class Timing:
    best_s: float
    mean_s: float
    runs: int

    def steps_per_s(self, steps: int) -> float:
        return steps / self.best_s


def measure(fn: Callable[[], object], *, warmup: int = 2, runs: int = 5) -> Timing:
    """Time ``fn`` end to end, blocking on its output pytree."""
    for _ in range(warmup):
        jax.block_until_ready(fn())
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    return Timing(best_s=min(times), mean_s=sum(times) / len(times), runs=runs)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with XProf/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
