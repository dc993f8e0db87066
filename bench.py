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

Round-5 methodology re-pin (VERDICT r4 task 1): rounds 2-4 fetched the
full (S, LB) f32 regret tile (1 MB) through the ~10 MB/s relay INSIDE
the timed window — ~100 ms of transfer per repeat against ~90 ms of
compute at K=8, which both halved the reported rate and made it hostage
to relay congestion (r04's "regression" to 2.02e10 was exactly this).
The fence is now a device-side jnp.sum -> 4-byte fetch (still forces
the full computation — sum depends on every regret) and K=256 chained
launches, which measures the kernel itself: 5.6e10 steps/s with ~1%
spread, vs 2.4-2.7e10 +-30% under the old accounting.  The JSON line
carries best/median/min over >=5 fenced repeats plus relay-health
telemetry (compile count/seconds, dispatch-latency probe) so any
future snapshot is self-diagnosing.
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
    K = 256
    z_dev, y_dev = random_packed_batch(jax.random.key(0), T, LB,
                                       dtype=jnp.bfloat16)
    # int8 label stream (r5): y is exactly {-1, 0, +1} by the data
    # contract, so storing it as int8 is value-exact (bit-equal outputs,
    # measured) and cuts per-step HBM traffic 12 -> 11 bytes — worth
    # ~+6% on this HBM-bound kernel (see docs/BENCHMARKS.md roofline).
    y_dev = y_dev.astype(jnp.int8)
    S = z_dev.shape[2]

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_k(z, y, *, k):
        # Distinct eta per launch defeats CSE; the sum forces all k.
        def body(i, acc):
            eta = np.float32(np.sqrt(2.0)) * (
                1.0 + 1e-6 * i.astype(jnp.float32))
            # lanes=128/unroll=16: +6.9% vs the historical 256/8
            # (5.57e10 vs 5.21e10, interleaved best-of-4 at K=256) —
            # resolvable only under the r5 scalar fence; the old
            # "levers neutral" finding was fetch-noise (BENCH_DETAILS
            # fused_lever_* records).
            return acc + regrets_fused(z, y, eta, alg_flag=0,
                                       lanes_per_program=128, unroll=16)
        acc = jax.lax.fori_loop(0, k, body,
                                jnp.zeros((S, LB), jnp.float32))
        # Scalar fence: the sum depends on every regret, so fetching it
        # forces full completion while moving 4 bytes, not 1 MB, through
        # the relay (see module docstring).
        return jnp.sum(acc)

    np.asarray(run_k(z_dev, y_dev, k=K))  # compile + warm (host fetch)

    # >=5 fenced repeats (VERDICT r4 task 1): a single best-of number
    # cannot distinguish a kernel regression from relay congestion
    # (r04's snapshot read 18% low purely from congestion).  The JSON
    # line now carries median/min/max so the spread is part of the
    # artifact, plus the relay-health probes (task 8).
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(run_k(z_dev, y_dev, k=K))  # fetch => true completion
        times.append(time.perf_counter() - t0)
    steps = K * S * LB * T
    rates = sorted(steps / t for t in times)
    return {"best": rates[-1], "median": rates[len(rates) // 2],
            "min": rates[0], "repeats": len(rates)}


def main():
    from online_convex_optimization_tpu.utils import relay

    sys.path.insert(0, ".")
    relay.install()
    stats = _bench_tpu()
    value = stats["best"]
    per_chip_target = 1e9 / 16.0  # v5e-16 aggregate target, per chip
    health = relay.snapshot()  # compile count/seconds + dispatch probe
    print(json.dumps({
        "metric": "ftrl_steps_per_s",
        "value": value,
        "unit": "steps/s",
        "vs_baseline": value / per_chip_target,
        "median": stats["median"],
        "min": stats["min"],
        "repeats": stats["repeats"],
        "spread_frac": (value - stats["min"]) / value if value else 0.0,
        "relay": health,
    }))


if __name__ == "__main__":
    main()
