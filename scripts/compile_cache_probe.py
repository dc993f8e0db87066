"""Persistent-compilation-cache probe (VERDICT round-3 task 3).

Measures whether ``jax_compilation_cache_dir`` survives this harness's
remote-compile relay: every fresh process pays 30-300 s per shape at the
relay's compile service (CLAUDE.md), and the round-2/3 verdicts asked for
a cold/warm measurement in two fresh processes to decide whether the
persistent cache removes that tax.

One invocation = one fresh process.  It times, for a fixed shape each of
  - the XLA scan game (``models.linear.simulate_linear_batch``), and
  - (TPU only) the fused Pallas game kernel (``ops.pallas_game``),
the wall time of the FIRST fenced call (trace + compile + run) and of a
second call in the same process (the in-process-cache floor).  The
orchestration lives in ``scripts/compile_cache_experiment.sh``:

  run 1: --cache-dir <fresh dir>   -> cold, populates the cache
  run 2: --cache-dir <same dir>    -> warm iff the persistent cache works
  run 3: (no cache dir)            -> control cold

Appends one JSON line per program to ``--out`` (BENCH_DETAILS.jsonl
schema) tagged with the run label, and prints them.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _first_and_second(fn):
    t0 = time.perf_counter()
    np.asarray(fn())
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(fn())
    second = time.perf_counter() - t0
    return first, second


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cache-dir", default=None)
    parser.add_argument("--label", required=True,
                        help="cold / warm / control")
    parser.add_argument("--out", default="BENCH_DETAILS.jsonl")
    args = parser.parse_args()

    import jax

    if args.cache_dir:
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from online_convex_optimization_tpu.models.linear import (
        simulate_linear_batch)
    from online_convex_optimization_tpu.utils.logging_utils import log_metrics

    backend = jax.default_backend()
    records = []

    # Program 1: the XLA scan game (pure XLA compile).  An off-round
    # shape so nothing else in the repo has ever compiled it.
    B, T, d = 96, 999, 5
    kz, ky = jax.random.split(jax.random.key(7))
    z = jax.random.normal(kz, (B, T, d), jnp.float32)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1.0)
    y = jax.random.rademacher(ky, (B, T), jnp.float32)
    first, second = _first_and_second(
        lambda: simulate_linear_batch(z, y, 0, 1.414).regret)
    records.append({"metric": "compile_cache_scan_first_s", "value": first,
                    "unit": "s",
                    "note": f"label={args.label} cache_dir="
                            f"{bool(args.cache_dir)} second_call={second:.3f}s "
                            f"shape=({B},{T},{d})"})

    # Program 2 (TPU): the fused Pallas kernel (Mosaic compile path).
    if backend == "tpu":
        from online_convex_optimization_tpu.data.device import (
            random_packed_batch)
        from online_convex_optimization_tpu.ops.pallas_game import (
            regrets_fused, sublanes_for)

        Tk, LB = 768, 1024
        S = sublanes_for(jnp.bfloat16)
        zd, yd = random_packed_batch(jax.random.key(11), Tk, LB,
                                     dtype=jnp.bfloat16)

        @jax.jit
        def run(zp, yp):
            return regrets_fused(zp, yp, np.float32(np.sqrt(2.0)),
                                 alg_flag=0)

        first, second = _first_and_second(lambda: run(zd, yd))
        records.append({"metric": "compile_cache_pallas_first_s",
                        "value": first, "unit": "s",
                        "note": f"label={args.label} cache_dir="
                                f"{bool(args.cache_dir)} "
                                f"second_call={second:.3f}s "
                                f"shape=(T={Tk},S={S},LB={LB})"})

    for r in records:
        r["backend"] = backend
        print(r)
        log_metrics(args.out, r)


if __name__ == "__main__":
    main()
