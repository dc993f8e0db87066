"""Secondary benchmark suite (the headline lives in bench.py).

Measures every major compute path on the current backend and appends
JSON-line records to BENCH_DETAILS.jsonl:

  - pallas_fused   : single-pass bf16 regret kernel (headline twin)
  - pallas_v2      : f32 kernel + XLA comparator epilogue (steps/s)
  - pallas_smart   : fused single-pass SMART kernel (steps/s)
  - pallas_synth   : generation-fused kernel, zero HBM data traffic
  - eta_sweep      : 64-point learning-rate sweep kernel (seq*steps/s)
  - xla_scan       : batched lax.scan game (steps/s)
  - smart          : SMART scan path, O(T d) identity phase B (steps/s)
  - exact_prefix   : all-prefix ADMM (prefix solves/s)

Run:  python bench_suite.py [--small]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _fetch_time(fn, runs=3):
    np.asarray(fn())
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def d_envelope(args):
    """Measure the kernel family's d-envelope (VERDICT round-2 task 4):
    fused Pallas kernel vs XLA scan throughput at d in {5, 16, 32, 64, 128},
    T=1024.  The kernel's per-step work is ~3d full-width VPU ops per
    lane; the scan amortizes d into MXU matvecs — past a crossover the
    scan wins and `ops.pallas_game.kernel_envelope` must route there.
    Appends one record per (path, d) to BENCH_DETAILS.jsonl."""
    import jax
    import jax.numpy as jnp

    from online_convex_optimization_tpu.data.device import random_packed_batch
    from online_convex_optimization_tpu.models.linear import simulate_linear_batch
    from online_convex_optimization_tpu.ops.pallas_game import (
        regrets_fused, sublanes_for)
    from online_convex_optimization_tpu.utils.logging_utils import log_metrics

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    if not on_tpu:
        print("d-envelope is a TPU measurement; backend =", backend)
        return

    T, K = 1024, 8
    records = []
    for d in (5, 16, 32, 64, 128):
        # Constant total z footprint: shrink the lane batch as d grows.
        LB = max(128, (16384 * 5 // d) // 128 * 128)
        S = sublanes_for(jnp.bfloat16)
        zd, yd = random_packed_batch(jax.random.key(d), T, LB, d=d,
                                     dtype=jnp.bfloat16)

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_fused(z, y, *, k):
            def body(i, acc):
                eta = np.float32(np.sqrt(2.0)) * (
                    1.0 + 1e-6 * i.astype(jnp.float32))
                return acc + regrets_fused(z, y, eta, alg_flag=0)
            return jnp.sum(jax.lax.fori_loop(0, k, body,
                                             jnp.zeros((S, LB),
                                                       jnp.float32)))

        try:
            secs = _fetch_time(lambda: run_fused(zd, yd, k=K)) / K
            records.append({
                "metric": f"d_envelope_kernel_d{d}_steps_per_s",
                "value": S * LB * T / secs, "unit": "steps/s",
                "note": f"fused kernel, d={d}, {S * LB} seqs, T={T}"})
        except ValueError as e:  # VMEM budget: record the refusal
            records.append({
                "metric": f"d_envelope_kernel_d{d}_steps_per_s",
                "value": 0.0, "unit": "steps/s",
                "note": f"kernel refused shape: {e}"})
        del zd, yd

        B = 2048
        kz, ky = jax.random.split(jax.random.key(100 + d))
        z = jax.random.normal(kz, (B, T, d), jnp.float32)
        z = z / jnp.maximum(
            jnp.linalg.norm(z, axis=-1, keepdims=True), 1.0)
        y = jax.random.rademacher(ky, (B, T), jnp.float32)
        secs = _fetch_time(
            lambda: simulate_linear_batch(z, y, 0, 1.414, unroll=8).regret)
        records.append({
            "metric": f"d_envelope_scan_d{d}_steps_per_s",
            "value": B * T / secs, "unit": "steps/s",
            "note": f"XLA scan, d={d}, {B} seqs, T={T}"})
        del z, y

    for r in records:
        r["backend"] = backend
        print(r)
        log_metrics(args.out, r)


def d_envelope_big(args):
    """Extend the measured d-envelope past the register-state boundary
    (VERDICT round-4 task 2): the VMEM-state d-loop kernel
    (ops/pallas_game state='vmem') at d in {128, 256, 512} vs the XLA
    scan, T=1024 — plus reg-vs-vmem at d=128 so the state-mode cost is
    itself measured.  bf16 storage where the (2d+2)-tile f32 state +
    streamed blocks fit the 11 MB budget; f32 storage (S=8) at d=512
    where bf16's 16-sublane state does not.  Appends records to
    BENCH_DETAILS.jsonl."""
    import jax
    import jax.numpy as jnp

    from online_convex_optimization_tpu.data.device import random_packed_batch
    from online_convex_optimization_tpu.models.linear import simulate_linear_batch
    from online_convex_optimization_tpu.ops.pallas_game import (
        regrets_fused, sublanes_for)
    from online_convex_optimization_tpu.utils.logging_utils import log_metrics

    backend = jax.default_backend()
    if backend != "tpu":
        print("d-envelope-big is a TPU measurement; backend =", backend)
        return

    T, K = 1024, 8
    records = []
    combos = [(128, "reg", jnp.bfloat16), (128, "vmem", jnp.bfloat16),
              (256, "vmem", jnp.bfloat16), (512, "vmem", jnp.bfloat16),
              (512, "vmem", jnp.float32)]
    for d, state, dtype in combos:
        LB = max(128, (16384 * 5 // d) // 128 * 128)
        S = sublanes_for(dtype)
        dname = jnp.dtype(dtype).name
        try:
            zd, yd = random_packed_batch(jax.random.key(d), T, LB, d=d,
                                         dtype=dtype)

            @functools.partial(jax.jit, static_argnames=("k", "state"))
            def run_fused(z, y, *, k, state):
                def body(i, acc):
                    eta = np.float32(np.sqrt(2.0)) * (
                        1.0 + 1e-6 * i.astype(jnp.float32))
                    return acc + regrets_fused(z, y, eta, alg_flag=0,
                                               state=state)
                return jnp.sum(jax.lax.fori_loop(0, k, body,
                                                 jnp.zeros((S, LB),
                                                           jnp.float32)))

            secs = _fetch_time(lambda: run_fused(zd, yd, k=K,
                                                 state=state)) / K
            records.append({
                "metric": (f"d_envelope_kernel_d{d}_{state}_{dname}"
                           "_steps_per_s"),
                "value": S * LB * T / secs, "unit": "steps/s",
                "note": (f"fused kernel state={state}, d={d}, {dname}, "
                         f"{S * LB} seqs, T={T}")})
            del zd, yd
        except Exception as e:  # VMEM budget / mosaic limit: record it
            records.append({
                "metric": (f"d_envelope_kernel_d{d}_{state}_{dname}"
                           "_steps_per_s"),
                "value": 0.0, "unit": "steps/s",
                "note": f"kernel refused: {type(e).__name__}: {e}"[:400]})

    for d, B in ((256, 2048), (512, 1024)):
        kz, ky = jax.random.split(jax.random.key(100 + d))
        z = jax.random.normal(kz, (B, T, d), jnp.float32)
        z = z / jnp.maximum(
            jnp.linalg.norm(z, axis=-1, keepdims=True), 1.0)
        y = jax.random.rademacher(ky, (B, T), jnp.float32)
        secs = _fetch_time(
            lambda: simulate_linear_batch(z, y, 0, 1.414, unroll=8).regret)
        records.append({
            "metric": f"d_envelope_scan_d{d}_steps_per_s",
            "value": B * T / secs, "unit": "steps/s",
            "note": f"XLA scan, d={d}, {B} seqs, T={T}"})
        del z, y

    for r in records:
        r["backend"] = backend
        print(r)
        log_metrics(args.out, r)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--small", action="store_true",
                        help="CPU-sized shapes for smoke runs")
    parser.add_argument("--out", default="BENCH_DETAILS.jsonl")
    parser.add_argument("--d-envelope", action="store_true",
                        help="measure kernel-vs-scan d crossover only")
    parser.add_argument("--d-envelope-big", action="store_true",
                        help="VMEM-state kernel vs scan at d in "
                             "{128,256,512}")
    args = parser.parse_args()

    if args.d_envelope:
        d_envelope(args)
        return
    if args.d_envelope_big:
        d_envelope_big(args)
        return

    import jax
    import jax.numpy as jnp

    from online_convex_optimization_tpu.models.linear import simulate_linear_batch
    from online_convex_optimization_tpu.models.smart import simulate_smart_batch
    from online_convex_optimization_tpu.models.sweep_api import ftrl_eta_sweep
    from online_convex_optimization_tpu.models.exact_ftl import _admm_all_prefixes
    from online_convex_optimization_tpu.ops.pallas_game import (
        ftrl_scales, regrets_packed)
    from online_convex_optimization_tpu.utils.logging_utils import log_metrics

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    small = args.small or not on_tpu

    records = []
    rng = np.random.default_rng(0)

    # --- pallas kernels (TPU only) ---
    if on_tpu:
        import math

        from online_convex_optimization_tpu.data.device import (
            random_packed_batch)
        from online_convex_optimization_tpu.ops.pallas_game import (
            regrets_fused, synthetic_regrets)
        from online_convex_optimization_tpu.ops.pallas_smart import (
            smart_regrets_packed)

        # Scalar fences (r5): fetching the (S, LB) f32 result tile
        # (1 MB at ~10 MB/s) inside the timed window was burying ~half
        # the kernel time in relay transfer (see bench.py's methodology
        # re-pin); every kernel wrapper now reduces to a scalar on
        # device — the sum depends on every result, so the fetch still
        # forces full completion while moving 4 bytes.  K=64 chained
        # launches (bench.py's headline uses 256; 64 keeps the suite's
        # wall reasonable and measures ~94% of the K=256 plateau).
        T, LB, K = 1024, 16384, 64
        zd, yd = random_packed_batch(jax.random.key(0), T, LB,
                                     dtype=jnp.bfloat16)
        # int8 label stream for the HBM-bound kernels (value-exact —
        # y is {-1,0,+1} by contract; 12 -> 11 B/step, ~+5% measured).
        # The compute-bound SMART kernel keeps bf16 y (int8 measured
        # neutral there, -0.7%).
        yd8 = yd.astype(jnp.int8)
        S = zd.shape[2]
        scales = ftrl_scales(T, np.sqrt(2.0))

        # Headline: single-pass fused regret kernel, bf16 HBM storage.
        @functools.partial(jax.jit, static_argnames=("k",))
        def run_fused(z, y, *, k):
            def body(i, acc):
                eta = np.float32(np.sqrt(2.0)) * (
                    1.0 + 1e-6 * i.astype(jnp.float32))
                return acc + regrets_fused(z, y, eta, alg_flag=0,
                                           lanes_per_program=128,
                                           unroll=16)
            return jnp.sum(jax.lax.fori_loop(0, k, body,
                                             jnp.zeros((S, LB),
                                                       jnp.float32)))

        secs = _fetch_time(lambda: run_fused(zd, yd8, k=K)) / K
        records.append({"metric": "pallas_fused_steps_per_s",
                        "value": S * LB * T / secs, "unit": "steps/s",
                        "note": "bf16 z + int8 y single-pass, identity "
                                "comparator, scalar fence K=64"})

        # Legacy two-part path (kernel + XLA comparator epilogue), f32.
        zf, yf = random_packed_batch(jax.random.key(2), T, LB)

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_v2(z, y, *, k):
            def body(i, acc):
                sc = scales * (1.0 + 1e-6 * i.astype(jnp.float32))
                return acc + regrets_packed(z, y, sc, alg_flag=0)
            return jnp.sum(jax.lax.fori_loop(0, k, body,
                                             jnp.zeros((8, LB),
                                                       jnp.float32)))

        secs = _fetch_time(lambda: run_v2(zf, yf, k=K)) / K
        records.append({"metric": "pallas_v2_steps_per_s",
                        "value": 8 * LB * T / secs, "unit": "steps/s"})
        del zf, yf

        # Fused SMART: whole algorithm (both tracks + switch + comparator)
        # in one O(T d) streaming pass (reference hot path is O(T^2 d)).
        th = jnp.full((S, LB), math.sqrt(2.0 * T), jnp.float32)
        et = jnp.full((S, LB), math.sqrt(2.0), jnp.float32)

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_smart(z, y, th, et, *, k):
            def body(i, acc):
                r, _ = smart_regrets_packed(
                    z, y, th, et * (1.0 + 1e-6 * i.astype(jnp.float32)),
                    lanes_per_program=128, unroll=16)
                return acc + r
            return jnp.sum(jax.lax.fori_loop(0, k, body,
                                             jnp.zeros((S, LB),
                                                       jnp.float32)))

        secs = _fetch_time(lambda: run_smart(zd, yd, th, et, k=K)) / K
        records.append({"metric": "pallas_smart_steps_per_s",
                        "value": S * LB * T / secs, "unit": "steps/s",
                        "note": "fused single-pass SMART kernel"})

        # Generation-fused mode: sequences born in VMEM from the on-core
        # PRNG, zero HBM data traffic, single pass.
        @functools.partial(jax.jit, static_argnames=("k",))
        def run_syn(eta, *, k):
            def body(i, acc):
                return acc + synthetic_regrets(
                    i, eta * (1.0 + 1e-6 * i.astype(jnp.float32)),
                    T=T, lane_batch=LB)
            return jnp.sum(jax.lax.fori_loop(0, k, body,
                                             jnp.zeros((8, LB),
                                                       jnp.float32)))

        secs = _fetch_time(lambda: run_syn(jnp.float32(np.sqrt(2.0)),
                                           k=K)) / K
        records.append({"metric": "pallas_synthetic_steps_per_s",
                        "value": 8 * LB * T / secs, "unit": "steps/s",
                        "note": "in-kernel PRNG data generation"})
        del zd, yd

        # 64-point eta sweep as a kernel grid dimension (BASELINE config 2).
        from online_convex_optimization_tpu.ops.pallas_game import (
            eta_sweep_packed)
        LBs = 2048
        zs, ys = random_packed_batch(jax.random.key(1), T, LBs,
                                     dtype=jnp.bfloat16)
        Ss = zs.shape[2]
        grid64 = jnp.asarray(np.linspace(0.05, 4.0, 64, dtype=np.float32))
        sweep_sum = jax.jit(
            lambda z, y, g: jnp.sum(eta_sweep_packed(z, y, g)))
        secs = _fetch_time(lambda: sweep_sum(zs, ys, grid64))
        records.append({"metric": "pallas_eta_sweep64_seqsteps_per_s",
                        "value": 64 * Ss * LBs * T / secs,
                        "unit": "seq*steps/s",
                        "note": "sweep as kernel grid dimension, bf16"})
        del zs, ys

    # --- streaming long-horizon game (TPU only): T=1e6 per sequence at
    # constant device memory; chunks are generated ON DEVICE (host feed
    # through the relay would bench the 10 MB/s link, not the chip) and a
    # mid-run carry checkpoint round-trips through save_pytree. ---
    if on_tpu:
        from online_convex_optimization_tpu.models.streaming import (
            StreamingGame)
        from online_convex_optimization_tpu.utils.checkpointing import (
            load_pytree, save_pytree)

        B_s, CT, N_CHUNKS = 1024, 32768, 32          # T = 1,048,576
        d_s = 5

        @functools.partial(jax.jit, static_argnames=("ct", "b", "d"))
        def gen_chunk(key, ct, b, d):
            kz, ky = jax.random.split(key)
            zc = jax.random.normal(kz, (ct, b, d), jnp.float32)
            zc /= jnp.maximum(jnp.linalg.norm(zc, axis=-1, keepdims=True),
                              1.0)
            yc = jax.random.rademacher(ky, (ct, b), jnp.float32)
            return zc, yc

        keys = list(jax.random.split(jax.random.key(7), N_CHUNKS))
        game = StreamingGame(B=B_s, d=d_s, alg_flag=0, eta0=np.sqrt(2.0))
        game.feed(*gen_chunk(keys[0], CT, B_s, d_s))   # compile + warm
        np.asarray(game.state.cum_loss)

        game = StreamingGame(B=B_s, d=d_s, alg_flag=0, eta0=np.sqrt(2.0))
        t0 = time.perf_counter()
        for i, k in enumerate(keys):
            game.feed(*gen_chunk(k, CT, B_s, d_s))
            if i == N_CHUNKS // 2:                      # mid-run checkpoint
                save_pytree("/tmp/stream_carry.npz", game.carry_state())
                game.resume(load_pytree("/tmp/stream_carry.npz",
                                        game.carry_state()))
        final_cum = np.asarray(game.state.cum_loss)     # host fetch fence
        secs = time.perf_counter() - t0
        assert np.isfinite(final_cum).all()
        records.append({"metric": "streaming_T1M_steps_per_s",
                        "value": B_s * CT * N_CHUNKS / secs,
                        "unit": "steps/s",
                        "note": "T=2^20, B=1024, device-generated chunks, "
                                "mid-run carry checkpoint round-trip"})

        # Kernel-speed streaming: carry-in/carry-out Pallas chunks with the
        # replay-free identity comparator (models/streaming.py::
        # StreamingKernelGame).  One device-resident bf16 chunk is re-fed
        # with an advancing round offset — this measures the streaming
        # ADVANCE path (per-feed dispatch + kernel), not data generation.
        from online_convex_optimization_tpu.models.streaming import (
            StreamingKernelGame)

        LB_k, CT_k, N_k = 1024, 8192, 128            # T = 2^20
        zc, yc = random_packed_batch(jax.random.key(3), CT_k, LB_k,
                                     dtype=jnp.bfloat16)
        S_k = zc.shape[2]
        game = StreamingKernelGame(S_k * LB_k, 5, alg_flag=0,
                                   eta0=np.sqrt(2.0), dtype=jnp.bfloat16)
        game.feed_packed(zc, yc)                     # compile + warm
        np.asarray(game.carry[2])

        game = StreamingKernelGame(S_k * LB_k, 5, alg_flag=0,
                                   eta0=np.sqrt(2.0), dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        for i in range(N_k):
            game.feed_packed(zc, yc)
            if i == N_k // 2:                        # mid-run checkpoint
                save_pytree("/tmp/stream_kcarry.npz", game.carry_state())
                game.resume(load_pytree("/tmp/stream_kcarry.npz",
                                        game.carry_state()))
        reg = np.asarray(game.result().regret)       # host fetch fence
        secs = time.perf_counter() - t0
        assert np.isfinite(reg).all()
        records.append({"metric": "streaming_kernel_T1M_steps_per_s",
                        "value": S_k * LB_k * CT_k * N_k / secs,
                        "unit": "steps/s",
                        "note": "T=2^20, 16384 seqs, Pallas carry chunks, "
                                "replay-free identity comparator, mid-run "
                                "checkpoint round-trip; per-feed dispatch "
                                "through the relay dominates at this "
                                "batch (kernel-only twin below)"})
        del zc, yc

        # Kernel-only streaming throughput: K chained carry advances
        # inside ONE jit (no per-feed dispatch) at the headline batch.
        from online_convex_optimization_tpu.ops.pallas_game import (
            play_packed_stream, zero_stream_carry)

        zd, yd = random_packed_batch(jax.random.key(0), T, LB,
                                     dtype=jnp.bfloat16)

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_stream_k(z, y, *, k):
            carry0 = zero_stream_carry(LB, 5, S)

            def body(i, c):
                return play_packed_stream(
                    z, y, np.float32(np.sqrt(2.0)),
                    i.astype(jnp.float32) * T, c,
                    lanes_per_program=128, unroll=16)
            c = jax.lax.fori_loop(0, k, body, carry0)
            return jnp.sum(c[2])

        secs = _fetch_time(lambda: run_stream_k(zd, yd.astype(jnp.int8),
                                                k=K)) / K
        records.append({"metric": "stream_kernel_chained_steps_per_s",
                        "value": S * LB * T / secs, "unit": "steps/s",
                        "note": "carry-in/carry-out kernel, K advances "
                                "chained in one dispatch — the streaming "
                                "hot path without relay overhead"})

    # --- xla scan / smart / sweep / exact (any backend) ---
    B, T = (256, 256) if small else (8192, 1024)
    z = rng.standard_normal((B, T, 5)).astype(np.float32)
    z /= np.maximum(1.0, np.linalg.norm(z, axis=-1, keepdims=True))
    y = np.where(rng.random((B, T)) < 0.5, -1, 1).astype(np.float32)
    zd = jax.device_put(jnp.asarray(z))
    yd = jax.device_put(jnp.asarray(y))

    secs = _fetch_time(
        lambda: simulate_linear_batch(zd, yd, 0, 1.414, unroll=8).regret)
    records.append({"metric": "xla_scan_steps_per_s", "value": B * T / secs,
                    "unit": "steps/s"})

    th = jnp.full((B,), np.sqrt(2.0 * T), jnp.float32)
    et = jnp.full((B,), np.sqrt(2.0), jnp.float32)
    secs = _fetch_time(
        lambda: simulate_smart_batch(zd, yd, th, et).regret)
    records.append({"metric": "smart_steps_per_s", "value": B * T / secs,
                    "unit": "steps/s",
                    "note": "scan path, O(T d) identity phase B"})

    # Quadratic track (BASELINE config 1): exact ball-constrained LS
    # FTL from running (A, b) statistics — per-step d x d eigh in a scan.
    from online_convex_optimization_tpu.models.quadratic import (
        simulate_quadratic_batch)
    Bq, Tq = (64, 256) if small else (4096, 1024)
    yq = (np.einsum("btd,d->bt", z[:Bq, :Tq],
                    np.full(5, 1 / np.sqrt(5.0), np.float32))
          + 0.1 * rng.standard_normal((Bq, Tq))).astype(np.float32)
    zq = jax.device_put(jnp.asarray(z[:Bq, :Tq]))
    yqd = jax.device_put(jnp.asarray(yq))
    secs = _fetch_time(
        lambda: simulate_quadratic_batch(zq, yqd, 1, 1.0).regret)
    records.append({"metric": "quadratic_exact_ftl_steps_per_s",
                    "value": Bq * Tq / secs, "unit": "steps/s",
                    "note": "ball-constrained LS leader via running "
                            "(A,b) stats; fused game kernel on TPU "
                            "(in-register stats + in-kernel solves)"})

    Bs = 32 if small else 512
    grid = jnp.asarray(np.linspace(0.05, 4.0, 64, dtype=np.float32))
    secs = _fetch_time(lambda: ftrl_eta_sweep(zd[:Bs], yd[:Bs], grid,
                                              use_kernel=False))
    records.append({"metric": "eta_sweep64_seqsteps_per_s",
                    "value": Bs * 64 * T / secs, "unit": "seq*steps/s",
                    "note": "scan path (kernel route benched separately)"})

    Tp = 128 if small else 512
    Bp = 4 if small else 32
    solve = jax.jit(jax.vmap(
        lambda zz, yy: _admm_all_prefixes(zz, yy, norm="l2", iters=600)[0]))
    secs = _fetch_time(lambda: solve(zd[:Bp, :Tp], yd[:Bp, :Tp]))
    records.append({"metric": "exact_prefix_solves_per_s",
                    "value": Bp * Tp / secs, "unit": "prefix solves/s",
                    "note": "600-iteration batched ADMM"})

    # Certified closed-form exact solves (models/linear_regime.py): on
    # contract data every prefix minimizer is w_t/||w_t||, checked by the
    # per-prefix optimality certificate — host f64, zero iterations.
    from online_convex_optimization_tpu.models.linear_regime import (
        certified_prefix_actions_batch)
    Bc, Tc = (4, 128) if small else (16, 1024)
    Xc = certified_prefix_actions_batch(z[:Bc, :Tc], y[:Bc, :Tc], "l2")
    secs = float("inf")  # warm best-of-3 (first call pays allocation)
    for _ in range(3):
        t0 = time.perf_counter()
        Xc = certified_prefix_actions_batch(z[:Bc, :Tc], y[:Bc, :Tc], "l2")
        secs = min(secs, time.perf_counter() - t0)
    if Xc is not None:
        records.append({"metric": "exact_prefix_certified_per_s",
                        "value": Bc * Tc / secs,
                        "unit": "prefix solves/s",
                        "note": "certified closed form incl. the "
                                "certificate check (host f64, EXACT)"})

    for r in records:
        r["backend"] = backend
        print(r)
        log_metrics(args.out, r)


if __name__ == "__main__":
    main()
