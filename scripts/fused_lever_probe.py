"""Re-probe the fused-kernel config levers under the honest fence.

Rounds 2-4 measured lanes_per_program/unroll "neutral within relay
noise" — but that was +-10-30% noise from the 1 MB result fetch the r5
methodology removed.  Under the scalar fence the spread is ~1%, so a
few-percent lever is now resolvable.  Grid: lanes in {128, 256, 512} x
unroll in {4, 8, 16} at the headline shape (T=1024, LB=16384, bf16),
K=64 chained launches, best-of-3.  Appends `fused_lever_*` records to
BENCH_DETAILS.jsonl.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="BENCH_DETAILS.jsonl")
    parser.add_argument("--k", type=int, default=64)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from online_convex_optimization_tpu.data.device import random_packed_batch
    from online_convex_optimization_tpu.ops.pallas_game import regrets_fused
    from online_convex_optimization_tpu.utils.logging_utils import log_metrics

    if jax.default_backend() != "tpu":
        print("TPU-only probe; backend =", jax.default_backend())
        return

    T, LB, K = 1024, 16384, args.k
    z, y = random_packed_batch(jax.random.key(0), T, LB, dtype=jnp.bfloat16)
    S = z.shape[2]

    @functools.partial(jax.jit, static_argnames=("k", "lanes", "unroll"))
    def run_k(z, y, *, k, lanes, unroll):
        def body(i, acc):
            eta = np.float32(np.sqrt(2.0)) * (
                1.0 + 1e-6 * i.astype(jnp.float32))
            return acc + regrets_fused(z, y, eta, alg_flag=0,
                                       lanes_per_program=lanes,
                                       unroll=unroll)
        return jnp.sum(jax.lax.fori_loop(0, k, body,
                                         jnp.zeros((S, LB), jnp.float32)))

    for lanes in (128, 256, 512):
        for unroll in (4, 8, 16):
            try:
                np.asarray(run_k(z, y, k=K, lanes=lanes, unroll=unroll))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(run_k(z, y, k=K, lanes=lanes, unroll=unroll))
                    best = min(best, time.perf_counter() - t0)
                rate = K * S * LB * T / best
                note = f"lanes={lanes} unroll={unroll} K={K} scalar fence"
            except Exception as e:
                rate, note = 0.0, f"refused: {type(e).__name__}: {e}"[:300]
            rec = {"metric": f"fused_lever_l{lanes}_u{unroll}_steps_per_s",
                   "value": rate, "unit": "steps/s", "note": note,
                   "backend": "tpu"}
            print(rec)
            log_metrics(args.out, rec)


if __name__ == "__main__":
    main()
