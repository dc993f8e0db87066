"""Headline benchmark: FTRL steps/s on one chip (batched online game).

Prints ONE JSON line:
  {"metric": "ftrl_steps_per_s", "value": N, "unit": "steps/s",
   "vs_baseline": N / 6.25e7}

Baseline normalization: BASELINE.json's north star is >= 1e9 FTRL steps/s
aggregate on a v5e-16 slice == 6.25e7 steps/s/chip with linear scaling, so
``vs_baseline == 1.0`` means exactly on target for this single chip and
larger is better.

A "step" is one full online round for one sequence: action (scale +
ball projection), prediction dot product, hinge loss, subgradient,
accumulator update (fast_algorithms.py:99-112 semantics).  The measured
program also includes the comparator replay (in-kernel), so the number is
end-to-end regret evaluation throughput, not a stripped inner loop.

Round-2 kernel: bf16 HBM storage (half the traffic of f32; compute in
f32) + fully fused in-kernel comparator replay + issue-rate-optimized
step math (ops/pallas_game.py::regrets_fused).
"""

import json
import sys
import time

import numpy as np


def _bench_tpu():
    import functools

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from online_convex_optimization_tpu.ops.pallas_game import regrets_fused

    from online_convex_optimization_tpu.data.device import random_packed_batch

    # 262144 sequences of horizon 1024 resident in HBM as bf16 (packed
    # kernel layout (T, d, 16, lanes)); K chained launches amortize
    # relay/dispatch latency out of the measurement (block_until_ready is
    # async through the axon relay — a host fetch is the only honest
    # fence).  Data is generated on device: host->device of GBs through
    # the relay would dominate wall time and bench nothing.
    T = 1024
    LB = 16384          # lane-batch; total sequences = 16 * LB (bf16)
    K = 8
    z_dev, y_dev = random_packed_batch(jax.random.key(0), T, LB,
                                       dtype=jnp.bfloat16)
    S = z_dev.shape[2]

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_k(z, y, *, k):
        # Distinct eta per launch defeats CSE; the sum forces all k.
        def body(i, acc):
            eta = np.float32(np.sqrt(2.0)) * (
                1.0 + 1e-6 * i.astype(jnp.float32))
            return acc + regrets_fused(z, y, eta, alg_flag=0,
                                       lanes_per_program=256, unroll=8)
        return jax.lax.fori_loop(0, k, body,
                                 jnp.zeros((S, LB), jnp.float32))

    np.asarray(run_k(z_dev, y_dev, k=K))  # compile + warm (host fetch)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run_k(z_dev, y_dev, k=K))  # fetch => true completion
        times.append(time.perf_counter() - t0)
    best = min(times)
    steps = K * S * LB * T
    return steps / best


def main():
    value = _bench_tpu()
    per_chip_target = 1e9 / 16.0  # v5e-16 aggregate target, per chip
    print(json.dumps({
        "metric": "ftrl_steps_per_s",
        "value": value,
        "unit": "steps/s",
        "vs_baseline": value / per_chip_target,
    }))


if __name__ == "__main__":
    main()
