"""Empirical worst-case g(T) estimation with artifact checkpointing.

Reference behavior: algorithms.py:135-171 — per T, run `g_runs` FTRL
simulations sequentially and keep the max regret; recomputed from scratch
on every invocation (SURVEY.md §5 "checkpoint/resume: absent").

Here: all runs of a horizon execute as one (chunked) device batch, and the
per-T maxima are checkpointed to a JSON artifact keyed by the config hash,
so interrupted sweeps resume and downstream SMART-EMP evaluation can reuse
the table without recomputation.
"""

from __future__ import annotations

import json
import math
import os
from typing import Dict, Optional

import numpy as np

from online_convex_optimization_tpu.data.sequences import (
    sample_g_batch,
    sample_g_instance,
)
from online_convex_optimization_tpu.models.linear import simulate_linear_batch
from online_convex_optimization_tpu.utils.debug import drop_nonfinite_stats

def _g_for_T(T: int, runs: int, base_seed: int, eta0: float, dtype,
             chunk: int) -> float:
    max_regret = 0.0
    for start in range(0, runs, chunk):
        n = min(chunk, runs - start)
        z = np.empty((n, T, 5), dtype=dtype)
        y = np.empty((n, T), dtype=dtype)
        for i in range(n):
            z[i], y[i] = sample_g_instance(base_seed, T, start + i,
                                           dtype=dtype)
        res = simulate_linear_batch(z, y, 0, eta0)
        max_regret = max(max_regret, float(np.max(np.asarray(res.regret))))
    return max_regret

def estimate_g(
    T_grid,
    *,
    runs: int,
    base_seed: int = 0,
    eta0: float = math.sqrt(2.0),
    dtype=np.float64,
    chunk: int = 4096,
    cache_path: Optional[str] = None,
    progress: bool = True,
) -> Dict[int, float]:
    """g(T) table, resuming from ``cache_path`` when present."""
    g: Dict[int, float] = {}
    if cache_path and os.path.exists(cache_path):
        with open(cache_path) as f:
            g = {int(k): float(v) for k, v in json.load(f).items()}

    todo = [int(t) for t in T_grid if int(t) not in g]
    iterator = todo
    if progress and todo:
        try:
            from tqdm import tqdm
            iterator = tqdm(todo, desc="Estimating g(T) on random sequences")
        except ImportError:
            pass

    for T in iterator:
        g[T] = _g_for_T(T, runs, base_seed, eta0, dtype, chunk)
        if cache_path:
            os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
            with open(cache_path, "w") as f:
                json.dump({str(k): v for k, v in sorted(g.items())}, f,
                          indent=1)

    return {int(t): g[int(t)] for t in T_grid}

def estimate_g_exact(
    T_grid,
    *,
    runs: int,
    base_seed: int = 0,
    eta0: float = math.sqrt(2.0),
    norm: str = "l2",
    iters: int = 2000,
    dtype=np.float64,
    cache_path: Optional[str] = None,
    progress: bool = True,
) -> Dict[int, float]:
    """g(T) with the exact comparator (exact_ftl_driver.py:64-117):
    regret = FTRL cum_loss - loss of the exact full-sequence minimizer."""
    import jax
    import jax.numpy as jnp

    from online_convex_optimization_tpu.models.exact_ftl import _admm_full
    from online_convex_optimization_tpu.ops.hinge import normalized_hinge

    g: Dict[int, float] = {}
    if cache_path and os.path.exists(cache_path):
        with open(cache_path) as f:
            g = {int(k): float(v) for k, v in json.load(f).items()}

    todo = [int(t) for t in T_grid if int(t) not in g]
    iterator = todo
    if progress and todo:
        try:
            from tqdm import tqdm
            iterator = tqdm(todo, desc="Estimating g(T) with exact FTRL")
        except ImportError:
            pass

    solve = jax.jit(jax.vmap(
        lambda zz, yy: _admm_full(zz, yy, norm=norm, iters=iters)))

    for T in iterator:
        z, y = sample_g_batch(base_seed, T, runs, dtype=dtype)
        cum = np.asarray(simulate_linear_batch(z, y, 0, eta0).cum_loss)
        max_regret = 0.0
        chunk = 64
        for start in range(0, runs, chunk):
            zc = jnp.asarray(z[start:start + chunk])
            yc = jnp.asarray(y[start:start + chunk])
            x_c, res = solve(zc, yc)                           # (n, d), (n,)
            # Failure containment (SURVEY §5): a diverged solve becomes a
            # NaN sentinel dropped from the max, never an exception inside
            # the sweep; drop_nonfinite_stats reports how many were lost.
            x_c = jnp.where((res <= 1e-3)[:, None], x_c, jnp.nan)
            comp = np.asarray(jnp.sum(
                normalized_hinge(jnp.einsum("ntd,nd->nt", zc, x_c), yc),
                axis=-1))
            regs = jnp.asarray(cum[start:start + chunk] - comp)
            n_ok, mx, _ = drop_nonfinite_stats(regs)
            if int(n_ok) < regs.shape[0]:
                import logging
                logging.getLogger("oco").warning(
                    "estimate_g_exact T=%d: dropped %d/%d diverged solves",
                    T, regs.shape[0] - int(n_ok), regs.shape[0])
            max_regret = max(max_regret, float(mx))
        g[T] = max_regret
        if cache_path:
            os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
            with open(cache_path, "w") as f:
                json.dump({str(k): v for k, v in sorted(g.items())}, f,
                          indent=1)

    return {int(t): g[int(t)] for t in T_grid}
