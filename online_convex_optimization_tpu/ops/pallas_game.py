"""Pallas game kernels: (sublane, lane) tiles of sequences, feature dim in
registers.

Layout rationale (a retired v1 design put d on sublanes, wasting 3/8 of
them at d=5 and paying cross-sublane reductions every step):

  - (sublane, lane) = (8, 128) carries **1024 independent sequences**;
  - the feature dimension d lives in the *time-major block index*: z is
    packed as (T, d, 8, 128B) and each z_j slice is an (8,128) register
    during the step, so every op is a full-width elementwise VPU op;
  - the FTRL projection folds algebraically into the prediction:
        q = clipfac * scale * <z_t, theta>,
    where scale = -eta0/sqrt(t) (prefetched per-step from SMEM) and
        clipfac = rsqrt(max(scale^2*||theta||^2, 1))
    — `max(.,1)` makes the in-ball case an exact no-op, eliminating the
    compare/select of the reference formulation;
  - per step: 3d+8 full-width ops for 1024 sequences (vs ~15 ops per 128
    sequences in v1);
  - T is chunked over a sequential grid dimension with the (theta, cum)
    state held in VMEM scratch across chunks, so arbitrary T streams
    through a fixed VMEM budget with the pipeline double-buffering the
    incoming z chunks;
  - DEFAULT CONFIG (r5, measured under the ~1% scalar fence): the
    HBM-bound kernels (game/fused/stream/SMART) default to
    lanes_per_program=128, unroll=16 — +6.9%/+3%/+5.5% over the old
    512/4 and 256/8 configs (BENCH_DETAILS *_lever_* records).  The
    compute-bound generation-fused kernel keeps wide lanes (512/4
    measured 1.7x its 128-lane config) — the preference is per-kernel,
    not universal;
  - zero-padding (z rows AND y entries zero) is loss- and gradient-neutral
    (q = 0, diff = 0), so heterogeneous horizons need no masks.

The comparator (final FTL action scored over the sequence,
fast_algorithms.py:113-115) is evaluated WITHOUT a second pass in the
fused kernels via the hinge identity (see ops/pallas_smart.py): carrying
w = sum y_t z_t and cnt = sum y_t^2 makes the comparator loss an O(d) dot
at finalize.  The legacy ``regrets_packed`` path keeps the XLA einsum
epilogue for callers that need (cum, theta) separately.

This is the f32/bf16 throughput path; parity semantics live in the x64
scan.  Data contract for the identity-based kernels: ||z_t||_2 <= 1 per
row and y in {-1, 0 (padding), +1} — guaranteed by every data builder in
this framework (the reference clips rows the same way,
sequence_generation.py:64-66).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
SEQ_TILE = LANES * SUBLANES  # sequences per (f32) grid program

# bf16 storage mode: z/y live in HBM as bfloat16 (half the traffic of f32 —
# the kernel is HBM-bandwidth-bound, so this is ~2x steps/s), converted to
# f32 registers on read; theta/cum accumulate in f32.  The native bf16 tile
# is (16, 128), so packed bf16 arrays carry 16 sublanes.
SUBLANES_BF16 = 16


def sublanes_for(dtype) -> int:
    """Native sublane count for a packed storage dtype."""
    return SUBLANES_BF16 if jnp.dtype(dtype) == jnp.bfloat16 else SUBLANES


# ------------------------------------------------------------------
# Shared in-kernel building blocks (used by all three kernels below)
# ------------------------------------------------------------------

def _ftl_eff(nth):
    """FTL action multiplier: x = eff * theta = -theta/||theta||, zero-safe."""
    return jnp.where(nth > 0.0, -jax.lax.rsqrt(jnp.maximum(nth, 1e-30)), 0.0)


def _ftrl_eff(scale, nth):
    """FTRL multiplier with the ball projection folded in:
    eff = scale * rsqrt(max(scale^2*||theta||^2, 1)); max(.,1) makes the
    in-ball case an exact no-op."""
    return scale * jax.lax.rsqrt(jnp.maximum((scale * scale) * nth, 1.0))


def _play_step(z_t, y_t, theta, cum, eff_fn):
    """One online round on a lane tile.

    z_t: list of d (8, lanes) feature slices; theta: list of d tiles;
    eff_fn(nth) -> action multiplier.  Returns updated (theta, cum).
    """
    d = len(theta)
    dotz = z_t[0] * theta[0]
    nth = theta[0] * theta[0]
    for j in range(1, d):
        dotz = dotz + z_t[j] * theta[j]
        nth = nth + theta[j] * theta[j]
    diff = eff_fn(nth) * dotz - y_t
    s = jnp.sign(diff)
    cum = cum + 0.5 * (diff * s)
    coef = 0.5 * s
    theta = [theta[j] + coef * z_t[j] for j in range(d)]
    return theta, cum


def _play_chunk(ct, unroll, step_fn, theta_acc, cum_acc, d):
    """Run ``ct`` rounds (unrolled fori_loop) from/into the scratch accs."""

    def body(i, carry):
        theta, cum = carry
        for u in range(unroll):
            theta, cum = step_fn(i * unroll + u, theta, cum)
        return theta, cum

    theta0 = [theta_acc[j] for j in range(d)]
    theta, cum = jax.lax.fori_loop(0, ct // unroll, body,
                                   (theta0, cum_acc[:]))
    for j in range(d):
        theta_acc[j] = theta[j]
    cum_acc[:] = cum


# ------------------------------------------------------------------
# VMEM-state d-loop building blocks (large-d kernels, VERDICT r4 task 2)
#
# The register-state kernels above fully unroll d: theta/w ride the
# fori_loop carry as d Python-list register slices — 3d straight-line
# VPU ops per step, optimal through the measured d <= 128 but compile-
# and register-pressure-bound beyond.  Here theta/w stay IN VMEM scratch
# (the ADMM kernel proved VMEM-resident iterate state, ops/pallas_admm)
# and each step runs two db-way-unrolled fori_loops over feature blocks:
# a reduce pass (dot, ||theta||^2) and an update pass (theta += c*z,
# w += y*z), with dynamic leading-dim indexing into the scratch tiles.
# Same math, same outputs; only the state residency differs.
# ------------------------------------------------------------------

def _dloop_reduce(k, z_ref, theta_acc, d, db, zero):
    """(dot, nth): sum_j z[k,j]*theta[j] and sum_j theta[j]^2 over all d
    feature slices, db-way unrolled, state read from VMEM scratch."""
    nb_d = d // db

    def body(jb, acc):
        dot, nth = acc
        for u in range(db):
            j = jb * db + u
            zj = z_ref[k, j].astype(jnp.float32)
            tj = theta_acc[j]
            dot = dot + zj * tj
            nth = nth + tj * tj
        return dot, nth

    dot, nth = jax.lax.fori_loop(0, nb_d, body, (zero, zero))
    for j in range(nb_d * db, d):      # static remainder (d % db slices)
        zj = z_ref[k, j].astype(jnp.float32)
        tj = theta_acc[j]
        dot = dot + zj * tj
        nth = nth + tj * tj
    return dot, nth


def _dloop_update(k, z_ref, theta_acc, coef, d, db, w_acc=None, y_t=None):
    """theta[j] += coef * z[k,j] (and w[j] += y_t * z[k,j] when carried),
    written straight back to VMEM scratch."""
    nb_d = d // db

    def body(jb, c):
        for u in range(db):
            j = jb * db + u
            zj = z_ref[k, j].astype(jnp.float32)
            theta_acc[j] = theta_acc[j] + coef * zj
            if w_acc is not None:
                w_acc[j] = w_acc[j] + y_t * zj
        return c

    jax.lax.fori_loop(0, nb_d, body, 0)
    for j in range(nb_d * db, d):
        zj = z_ref[k, j].astype(jnp.float32)
        theta_acc[j] = theta_acc[j] + coef * zj
        if w_acc is not None:
            w_acc[j] = w_acc[j] + y_t * zj


def _game_kernel_dloop(scale_ref, z_ref, y_ref, cum_ref, theta_ref,
                       theta_acc, cum_acc, *, ct: int, d: int, db: int,
                       nchunks: int, alg_flag: int, unroll: int):
    """VMEM-state twin of ``_game_kernel`` for large d: same play-step
    semantics (_play_step), theta resident in VMEM scratch with db-blocked
    feature loops instead of a d-wide register carry."""
    chunk = pl.program_id(1)

    @pl.when(chunk == 0)
    def _init():
        theta_acc[:] = jnp.zeros_like(theta_acc)
        cum_acc[:] = jnp.zeros_like(cum_acc)

    def one(k, cum):
        y_t = y_ref[k].astype(jnp.float32)
        zero = jnp.zeros_like(y_t)
        dotz, nth = _dloop_reduce(k, z_ref, theta_acc, d, db, zero)
        if alg_flag == 0:
            eff = _ftrl_eff(scale_ref[chunk * ct + k], nth)
        else:
            eff = _ftl_eff(nth)
        diff = eff * dotz - y_t
        s = jnp.sign(diff)
        cum = cum + 0.5 * (diff * s)
        _dloop_update(k, z_ref, theta_acc, 0.5 * s, d, db)
        return cum

    def body(i, cum):
        for u in range(unroll):
            cum = one(i * unroll + u, cum)
        return cum

    cum_acc[:] = jax.lax.fori_loop(0, ct // unroll, body, cum_acc[:])

    @pl.when(chunk == nchunks - 1)
    def _finalize():
        cum_ref[:] = cum_acc[:]
        theta_ref[:] = theta_acc[:]


def _regret_kernel_dloop(scaleh_ref, s2_ref, eta_ref, z_ref, y_ref, out_ref,
                         theta_acc, w_acc, sc_acc, *, ct: int, d: int,
                         db: int, nchunks: int, alg_flag: int,
                         per_lane: bool, unroll: int, dense: bool = False):
    """VMEM-state twin of ``_regret_kernel`` (fused game + identity
    comparator) for large d: theta2/w resident in VMEM scratch,
    db-blocked feature loops.  Same step algebra (theta2 accumulator,
    prefetched scaleh/s2, un-halved cum) — see _regret_kernel."""
    chunk = pl.program_id(1)

    @pl.when(chunk == 0)
    def _init():
        theta_acc[:] = jnp.zeros_like(theta_acc)
        w_acc[:] = jnp.zeros_like(w_acc)
        sc_acc[:] = jnp.zeros_like(sc_acc)

    if per_lane:
        eta = eta_ref[:]
        eta2 = eta * eta

    def one(k, state):
        cum, cnt = state
        y_t = y_ref[k].astype(jnp.float32)
        zero = jnp.zeros_like(y_t)
        dotz2, nth2 = _dloop_reduce(k, z_ref, theta_acc, d, db, zero)
        t_idx = chunk * ct + k
        if alg_flag == 0:
            if per_lane:
                s2 = eta2 * s2_ref[t_idx]
                scaleh = eta * scaleh_ref[t_idx]
            else:
                s2 = s2_ref[t_idx]
                scaleh = scaleh_ref[t_idx]
            clip = jax.lax.rsqrt(jnp.maximum(s2 * nth2, 1.0))
            diff = (scaleh * clip) * dotz2 - y_t
        else:
            eff = _ftl_eff(nth2)
            diff = eff * dotz2 - y_t
        s = jnp.sign(diff)
        cum = cum + diff * s          # == |q - y| (un-halved)
        _dloop_update(k, z_ref, theta_acc, s, d, db, w_acc=w_acc, y_t=y_t)
        if not dense:
            cnt = cnt + y_t * y_t
        return cum, cnt

    def body(i, state):
        for u in range(unroll):
            state = one(i * unroll + u, state)
        return state

    cum, cnt = jax.lax.fori_loop(0, ct // unroll, body,
                                 (sc_acc[0], sc_acc[1]))
    sc_acc[0], sc_acc[1] = cum, cnt

    @pl.when(chunk == nchunks - 1)
    def _finalize():
        zero = jnp.zeros_like(sc_acc[0])

        def fin(jb, acc):
            nth, dotw = acc
            for u in range(db):
                j = jb * db + u
                tj = theta_acc[j]
                nth = nth + tj * tj
                dotw = dotw + tj * w_acc[j]
            return nth, dotw

        nth, dotw = jax.lax.fori_loop(0, d // db, fin, (zero, zero))
        for j in range((d // db) * db, d):
            tj = theta_acc[j]
            nth = nth + tj * tj
            dotw = dotw + tj * w_acc[j]
        effC = _ftl_eff(nth)          # normalization: the 2x scale cancels
        if dense:
            comp2 = float(ct * nchunks) - effC * dotw
        else:
            comp2 = sc_acc[1] - effC * dotw
        out_ref[:] = 0.5 * (sc_acc[0] - comp2)


# Register-state kernels fully unroll d into the fori_loop carry; past
# this boundary the VMEM-state d-loop kernels take over (measured: the
# register variant's compile time and register pressure grow with d,
# while the d-loop variant is flat).
_D_REG_STATE_MAX = 128


def _choose_tiles(B, T, d, lanes_per_program, chunk_t, unroll, *,
                  sublanes: int = SUBLANES, itemsize: int = 4,
                  scratch_tiles: int = 0):
    """Pick (lanes, ct, unroll, nchunks, nb): lanes is a 128-multiple
    divisor of B; ct a power-of-two divisor of T sized so the
    double-buffered (z + y) blocks stay inside the VMEM budget.

    ``scratch_tiles``: number of f32 (sublanes, lanes) VMEM scratch tiles
    the kernel holds (theta/w/cum state).  The register-state kernels at
    d <= 128 pass 0 (their scratch fits the historical slack — changing
    their accounting would perturb the measured headline tiles); the
    VMEM-state large-d kernels pass (2d+2) etc. so the d=256/512 state is
    priced against the same 11 MB budget as the streamed blocks.
    """
    assert B % LANES == 0, B
    lanes = min(lanes_per_program, B)
    lanes -= lanes % LANES
    while B % lanes:
        lanes -= LANES
    vmem_budget = 11 * 1024 * 1024

    def _avail(lanes):
        return vmem_budget - scratch_tiles * sublanes * lanes * 4

    per_t = 2 * (d + 1) * sublanes * lanes * itemsize  # dbl-buffered z + y
    while (_avail(lanes) // per_t < 8 and lanes > LANES
           and scratch_tiles == 0):
        lanes = max(lanes // 2 - (lanes // 2) % LANES, LANES)
        while B % lanes:
            lanes -= LANES
        per_t = 2 * (d + 1) * sublanes * lanes * itemsize
    while _avail(lanes) // per_t < 1 and lanes > LANES:
        lanes = max(lanes // 2 - (lanes // 2) % LANES, LANES)
        while B % lanes:
            lanes -= LANES
        per_t = 2 * (d + 1) * sublanes * lanes * itemsize
    bound = _avail(lanes) // per_t
    if bound < 1:
        raise ValueError(
            f"d={d} too large for the VMEM budget at lanes={lanes}")
    bound = 1 << (bound.bit_length() - 1)
    ct = min(chunk_t, T, bound)
    while T % ct:
        ct //= 2
    unroll = min(unroll, ct)
    while ct % unroll:
        unroll //= 2
    return lanes, ct, unroll, T // ct, B // lanes


def _game_kernel(scale_ref, z_ref, y_ref, cum_ref, theta_ref,
                 theta_acc, cum_acc, *, ct: int, d: int, nchunks: int,
                 alg_flag: int, unroll: int):
    """One (lane-batch, time-chunk) grid step.

    scale (T,) SMEM; z (ct, d, 8, 128); y (ct, 8, 128);
    outs: cum (8, 128), theta (d, 8, 128); scratch mirrors the outs.
    """
    chunk = pl.program_id(1)

    @pl.when(chunk == 0)
    def _init():
        theta_acc[:] = jnp.zeros_like(theta_acc)
        cum_acc[:] = jnp.zeros_like(cum_acc)

    def one(k, theta, cum):
        # bf16 storage converts to f32 registers here (free for f32 inputs).
        z_t = [z_ref[k, j].astype(jnp.float32) for j in range(d)]
        if alg_flag == 0:
            eff_fn = functools.partial(_ftrl_eff, scale_ref[chunk * ct + k])
        else:
            eff_fn = _ftl_eff
        return _play_step(z_t, y_ref[k].astype(jnp.float32), theta, cum,
                          eff_fn)

    _play_chunk(ct, unroll, one, theta_acc, cum_acc, d)

    @pl.when(chunk == nchunks - 1)
    def _finalize():
        cum_ref[:] = cum_acc[:]
        for j in range(d):
            theta_ref[j] = theta_acc[j]


@functools.partial(jax.jit,
                   static_argnames=("alg_flag", "chunk_t", "unroll",
                                    "lanes_per_program", "interpret",
                                    "state", "d_block"))
def play_packed(z_pack: jnp.ndarray, y_pack: jnp.ndarray, scales: jnp.ndarray,
                *, alg_flag: int = 0, chunk_t: int = 256, unroll: int = 16,
                lanes_per_program: int = LANES, interpret: bool = False,
                state: str = "auto", d_block: int = 32):
    """Run the online game on packed inputs.

    Args:
      z_pack: (T, d, S, B) f32 or bf16, B % 128 == 0; S = 8 (f32) / 16
        (bf16).  bf16 storage halves HBM traffic; compute stays f32.
      y_pack: (T, S, B) same dtype (zero rows are inert padding).
      scales: (T,) f32 per-round FTRL scale -(eta0/sqrt(max(1,t))).
      lanes_per_program: preferred width each grid program owns; >128
        interleaves multiple independent lane-tiles per op to hide the
        per-step dependency-chain latency.  Reduced automatically to a
        128-multiple divisor of B; the effective time-chunk is then
        clamped (overriding ``chunk_t``) so the double-buffered z block
        stays inside the VMEM budget.
    Returns:
      (cum_loss (S, B), theta (d, S, B)) in f32.
    """
    T, d, S, B = z_pack.shape
    assert S == sublanes_for(z_pack.dtype), (S, z_pack.dtype)
    if state == "auto":
        state = "vmem" if d > _D_REG_STATE_MAX else "reg"
    lanes, ct, unroll, nchunks, nb = _choose_tiles(
        B, T, d, lanes_per_program, chunk_t, unroll,
        sublanes=S, itemsize=z_pack.dtype.itemsize,
        scratch_tiles=(d + 1) if state == "vmem" else 0)

    if state == "vmem":
        kernel = functools.partial(_game_kernel_dloop, ct=ct, d=d,
                                   db=min(d_block, d), nchunks=nchunks,
                                   alg_flag=alg_flag, unroll=unroll)
    else:
        kernel = functools.partial(_game_kernel, ct=ct, d=d, nchunks=nchunks,
                                   alg_flag=alg_flag, unroll=unroll)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # scales
        grid=(nb, nchunks),
        in_specs=[
            pl.BlockSpec((ct, d, S, lanes), lambda i, j, s: (j, 0, 0, i)),
            pl.BlockSpec((ct, S, lanes), lambda i, j, s: (j, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((S, lanes), lambda i, j, s: (0, i)),
            pl.BlockSpec((d, S, lanes), lambda i, j, s: (0, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, S, lanes), jnp.float32),
            pltpu.VMEM((S, lanes), jnp.float32),
        ],
    )
    cum, theta = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((S, B), jnp.float32),
            jax.ShapeDtypeStruct((d, S, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(scales, z_pack, y_pack)
    return cum, theta


def _game_eta_kernel(isqrt_ref, eta_ref, z_ref, y_ref, cum_ref, theta_ref,
                     theta_acc, cum_acc, *, ct: int, d: int, nchunks: int,
                     unroll: int):
    """FTRL game step with a PER-SEQUENCE eta tile.

    eta (S, lanes) VMEM gives every lane its own step size, so mixed-eta
    scenario batches (hyperparameter axis folded into the sequence axis)
    run at full main-kernel speed with no data re-streaming.
    isqrt (T,) SMEM holds 1/sqrt(max(1,t)).
    """
    chunk = pl.program_id(1)

    @pl.when(chunk == 0)
    def _init():
        theta_acc[:] = jnp.zeros_like(theta_acc)
        cum_acc[:] = jnp.zeros_like(cum_acc)

    neg_eta = -eta_ref[:]

    def one(k, theta, cum):
        z_t = [z_ref[k, j].astype(jnp.float32) for j in range(d)]
        scale = neg_eta * isqrt_ref[chunk * ct + k]
        return _play_step(z_t, y_ref[k].astype(jnp.float32), theta, cum,
                          functools.partial(_ftrl_eff, scale))

    _play_chunk(ct, unroll, one, theta_acc, cum_acc, d)

    @pl.when(chunk == nchunks - 1)
    def _finalize():
        cum_ref[:] = cum_acc[:]
        for j in range(d):
            theta_ref[j] = theta_acc[j]


@functools.partial(jax.jit,
                   static_argnames=("chunk_t", "unroll", "lanes_per_program",
                                    "interpret"))
def play_packed_eta(z_pack, y_pack, eta_pack, *, chunk_t: int = 256,
                    unroll: int = 4, lanes_per_program: int = 4 * LANES,
                    interpret: bool = False):
    """FTRL game with per-sequence eta (eta_pack (S, B) f32).

    Same layout/semantics as ``play_packed(alg_flag=0)`` except the step
    scale is -eta_pack * isqrt(t) per lane.  Returns (cum (S, B),
    theta (d, S, B)) in f32.
    """
    T, d, S, B = z_pack.shape
    assert S == sublanes_for(z_pack.dtype), (S, z_pack.dtype)
    assert eta_pack.shape == (S, B), eta_pack.shape
    lanes, ct, unroll, nchunks, nb = _choose_tiles(
        B, T, d, lanes_per_program, chunk_t, unroll,
        sublanes=S, itemsize=z_pack.dtype.itemsize)

    t = np.arange(1, T + 1, dtype=np.float32)
    isqrt = jnp.asarray(1.0 / np.sqrt(np.maximum(t, 1.0)))

    kernel = functools.partial(_game_eta_kernel, ct=ct, d=d, nchunks=nchunks,
                               unroll=unroll)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # isqrt
        grid=(nb, nchunks),
        in_specs=[
            pl.BlockSpec((S, lanes), lambda i, j, s: (0, i)),  # eta
            pl.BlockSpec((ct, d, S, lanes), lambda i, j, s: (j, 0, 0, i)),
            pl.BlockSpec((ct, S, lanes), lambda i, j, s: (j, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((S, lanes), lambda i, j, s: (0, i)),
            pl.BlockSpec((d, S, lanes), lambda i, j, s: (0, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, S, lanes), jnp.float32),
            pltpu.VMEM((S, lanes), jnp.float32),
        ],
    )
    cum, theta = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((S, B), jnp.float32),
            jax.ShapeDtypeStruct((d, S, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(isqrt, jnp.asarray(eta_pack, jnp.float32), z_pack, y_pack)
    return cum, theta


def _sweep_kernel(scaleh_ref, s2_ref, eta_ref, z_ref, y_ref, out_ref,
                  theta_acc, w_acc, sc_acc, *, ct: int, d: int,
                  nchunks: int, unroll: int):
    """Single-pass FTRL sweep step for one (lane-batch, eta-setting,
    time-chunk) grid step.

    The hyperparameter grid is a *grid dimension*: each (i, e) pass
    re-streams the same z/y blocks under a different scalar eta — the
    (sequence x setting) cross product costs no input duplication.  The
    comparator comes from the carried hinge-identity statistics (w, cnt)
    like _regret_kernel, so there is NO replay phase.  Step math follows
    _regret_kernel (theta2 accumulator, un-halved losses); scaleh (T,)
    SMEM holds -isqrt(t)/2, s2 (T,) holds 1/(4*max(1,t)), eta (E,) SMEM.
    """
    e = pl.program_id(1)
    chunk = pl.program_id(2)
    eta = eta_ref[e]
    eta2 = eta * eta

    @pl.when(chunk == 0)
    def _init():
        theta_acc[:] = jnp.zeros_like(theta_acc)
        w_acc[:] = jnp.zeros_like(w_acc)
        sc_acc[:] = jnp.zeros_like(sc_acc)

    def one(k, state):
        theta2, w, cum, cnt = state
        z_t = [z_ref[k, j].astype(jnp.float32) for j in range(d)]
        y_t = y_ref[k].astype(jnp.float32)
        dotz2 = z_t[0] * theta2[0]
        nth2 = theta2[0] * theta2[0]
        for j in range(1, d):
            dotz2 = dotz2 + z_t[j] * theta2[j]
            nth2 = nth2 + theta2[j] * theta2[j]
        t_idx = chunk * ct + k
        clip = jax.lax.rsqrt(jnp.maximum((eta2 * s2_ref[t_idx]) * nth2, 1.0))
        diff = ((eta * scaleh_ref[t_idx]) * clip) * dotz2 - y_t
        s = jnp.sign(diff)
        cum = cum + diff * s
        theta2 = [theta2[j] + s * z_t[j] for j in range(d)]
        w = [w[j] + y_t * z_t[j] for j in range(d)]
        cnt = cnt + y_t * y_t
        return theta2, w, cum, cnt

    def body(i, state):
        for u in range(unroll):
            state = one(i * unroll + u, state)
        return state

    state0 = ([theta_acc[j] for j in range(d)], [w_acc[j] for j in range(d)],
              sc_acc[0], sc_acc[1])
    theta2, w, cum, cnt = jax.lax.fori_loop(0, ct // unroll, body, state0)
    for j in range(d):
        theta_acc[j] = theta2[j]
        w_acc[j] = w[j]
    sc_acc[0], sc_acc[1] = cum, cnt

    @pl.when(chunk == nchunks - 1)
    def _finalize():
        nth = theta_acc[0] * theta_acc[0]
        dotw = theta_acc[0] * w_acc[0]
        for j in range(1, d):
            nth = nth + theta_acc[j] * theta_acc[j]
            dotw = dotw + theta_acc[j] * w_acc[j]
        effC = _ftl_eff(nth)
        out_ref[0] = 0.5 * (cum - (cnt - effC * dotw))


@functools.partial(jax.jit,
                   static_argnames=("chunk_t", "unroll", "lanes_per_program",
                                    "interpret"))
def eta_sweep_packed(z_pack, y_pack, eta_grid, *, chunk_t: int = 256,
                     unroll: int = 4, lanes_per_program: int = 4 * LANES,
                     interpret: bool = False):
    """FTRL regrets for every (sequence, eta0) pair at fused-kernel speed.

    Args:
      z_pack: (T, d, S, B) f32/bf16; y_pack: (T, S, B); eta_grid: (E,) f32.
    Returns: (E, S, B) regrets — BASELINE config 2 ("learning-rate sweep
    over 64 settings") as one kernel launch.
    """
    T, d, S, B = z_pack.shape
    E = eta_grid.shape[0]
    assert S == sublanes_for(z_pack.dtype), (S, z_pack.dtype)
    lanes, ct, u, nchunks, nb = _choose_tiles(
        B, T, d, lanes_per_program, chunk_t, unroll,
        sublanes=S, itemsize=z_pack.dtype.itemsize)

    t = np.arange(1, T + 1, dtype=np.float32)
    scaleh = jnp.asarray(-0.5 / np.sqrt(np.maximum(t, 1.0)))
    s2 = jnp.asarray(0.25 / np.maximum(t, 1.0))
    eta_grid = jnp.asarray(eta_grid, jnp.float32)

    kernel = functools.partial(_sweep_kernel, ct=ct, d=d, nchunks=nchunks,
                               unroll=u)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # scaleh, s2, eta_grid
        grid=(nb, E, nchunks),
        in_specs=[
            pl.BlockSpec((ct, d, S, lanes),
                         lambda i, e, j, s1, s2, s3: (j, 0, 0, i)),
            pl.BlockSpec((ct, S, lanes),
                         lambda i, e, j, s1, s2, s3: (j, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, S, lanes),
                               lambda i, e, j, s1, s2, s3: (e, 0, i)),
        scratch_shapes=[
            pltpu.VMEM((d, S, lanes), jnp.float32),   # theta2
            pltpu.VMEM((d, S, lanes), jnp.float32),   # w = sum y z
            pltpu.VMEM((2, S, lanes), jnp.float32),   # [cum, cnt]
        ],
    )
    regrets = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, S, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(scaleh, s2, eta_grid, z_pack, y_pack)
    return regrets


def _regret_kernel(scaleh_ref, s2_ref, eta_ref, z_ref, y_ref, out_ref,
                   theta_acc, w_acc, sc_acc, *, ct: int, d: int,
                   nchunks: int, alg_flag: int, per_lane: bool, unroll: int,
                   dense: bool = False):
    """End-to-end regret kernel: game + comparator in ONE streaming pass.

    The comparator (final FTL action scored over the sequence,
    fast_algorithms.py:113-115) needs no replay pass: by the hinge identity
    (ops/pallas_smart.py module docstring; requires ||z_t|| <= 1 and
    y in {-1, 0, +1}, both guaranteed by the data builders),

        comp_loss = 0.5 * (cnt - <x_c, w>),  w = sum y_t z_t, cnt = sum y^2,

    so carrying (w, cnt) — 12 extra ops/step — replaces the second stream
    over (z, y) entirely: half the HBM traffic, one pipeline pass.

    Issue-rate-optimized step (the play loop is VPU-issue-bound, ~1 native
    op/cycle measured):
      - the accumulator is theta2 = 2*theta (bit-exact: updates add s*z
        instead of 0.5*s*z), killing the per-step 0.5 multiply; all
        consumers are scale-invariant (FTL normalize) or fold the 1/2 into
        prefetched constants;
      - scaleh (T,) SMEM holds -eta/(2*sqrt(t)) so diff = scaleh*clip*dotz2
        - y reproduces scale*clip*<z,theta> - y;
      - s2 (T,) SMEM holds eta^2/(4*max(1,t)) so clip = rsqrt(max(s2*nth2,
        1)) reproduces rsqrt(max(scale^2*||theta||^2, 1)) without the
        per-step scale*scale multiply;
      - cum accumulates |q - y| un-halved; the final write emits
        0.5*(cum - comp).
    per_lane=True swaps the SMEM eta for an (S, lanes) eta tile input
    (mixed-eta scenario batches at full speed); scaleh/s2 then hold
    -isqrt(t)/2 and 1/(4*max(1,t)) with eta folded in-kernel (+2 ops).
    sc_acc (2, S, lanes) packs [cum, cnt].
    dense=True asserts y in {-1, +1} with NO zero padding: cnt == T
    statically, dropping its two per-step ops.
    """
    chunk = pl.program_id(1)

    @pl.when(chunk == 0)
    def _init():
        theta_acc[:] = jnp.zeros_like(theta_acc)
        w_acc[:] = jnp.zeros_like(w_acc)
        sc_acc[:] = jnp.zeros_like(sc_acc)

    if per_lane:
        eta = eta_ref[:]
        eta2 = eta * eta

    def one(k, state):
        theta2, w, cum, cnt = state
        z_t = [z_ref[k, j].astype(jnp.float32) for j in range(d)]
        y_t = y_ref[k].astype(jnp.float32)
        dotz2 = z_t[0] * theta2[0]
        nth2 = theta2[0] * theta2[0]
        for j in range(1, d):
            dotz2 = dotz2 + z_t[j] * theta2[j]
            nth2 = nth2 + theta2[j] * theta2[j]
        t_idx = chunk * ct + k
        if alg_flag == 0:
            if per_lane:
                s2 = eta2 * s2_ref[t_idx]
                scaleh = eta * scaleh_ref[t_idx]
            else:
                s2 = s2_ref[t_idx]
                scaleh = scaleh_ref[t_idx]
            clip = jax.lax.rsqrt(jnp.maximum(s2 * nth2, 1.0))
            diff = (scaleh * clip) * dotz2 - y_t
        else:
            eff = _ftl_eff(nth2)
            diff = eff * dotz2 - y_t
        s = jnp.sign(diff)
        cum = cum + diff * s          # == |q - y| (un-halved)
        theta2 = [theta2[j] + s * z_t[j] for j in range(d)]
        w = [w[j] + y_t * z_t[j] for j in range(d)]
        if not dense:
            cnt = cnt + y_t * y_t
        return theta2, w, cum, cnt

    def body(i, state):
        for u in range(unroll):
            state = one(i * unroll + u, state)
        return state

    state0 = ([theta_acc[j] for j in range(d)], [w_acc[j] for j in range(d)],
              sc_acc[0], sc_acc[1])
    theta2, w, cum, cnt = jax.lax.fori_loop(0, ct // unroll, body, state0)
    for j in range(d):
        theta_acc[j] = theta2[j]
        w_acc[j] = w[j]
    sc_acc[0], sc_acc[1] = cum, cnt

    @pl.when(chunk == nchunks - 1)
    def _finalize():
        nth = theta_acc[0] * theta_acc[0]
        dotw = theta_acc[0] * w_acc[0]
        for j in range(1, d):
            nth = nth + theta_acc[j] * theta_acc[j]
            dotw = dotw + theta_acc[j] * w_acc[j]
        effC = _ftl_eff(nth)          # normalization: the 2x scale cancels
        if dense:
            comp2 = float(ct * nchunks) - effC * dotw
        else:
            comp2 = sc_acc[1] - effC * dotw
        out_ref[:] = 0.5 * (sc_acc[0] - comp2)


@functools.partial(jax.jit,
                   static_argnames=("alg_flag", "chunk_t", "unroll",
                                    "lanes_per_program", "interpret",
                                    "dense", "state", "d_block"))
def regrets_fused(z_pack, y_pack, eta, *, alg_flag: int = 0,
                  chunk_t: int = 256, unroll: int = 16,
                  lanes_per_program: int = LANES,
                  interpret: bool = False, dense: bool = False,
                  state: str = "auto", d_block: int = 32):
    """Fully fused regret evaluation: game + identity-based comparator in
    ONE single-pass kernel — the headline throughput path (see
    _regret_kernel for the op-level design).  Requires the framework data
    contract: ||z_t|| <= 1 per row, y in {-1, 0 (padding), +1}.

    Args:
      z_pack: (T, d, S, B) f32/bf16; y_pack: (T, S, B).
      eta: scalar FTRL step scale, OR an (S, B) per-sequence eta array
        (FTRL only).  Ignored when alg_flag == 1 (FTL).
      dense: caller guarantees y in {-1, +1} with no zero-padded rounds
        (true for every full-horizon batch from the data builders);
        the valid-round count then needs no carried statistic.
    Returns: (S, B) f32 regrets.
    """
    T, d, S, B = z_pack.shape
    assert S == sublanes_for(z_pack.dtype), (S, z_pack.dtype)
    if state == "auto":
        state = "vmem" if d > _D_REG_STATE_MAX else "reg"
    lanes, ct, u, nchunks, nb = _choose_tiles(
        B, T, d, lanes_per_program, chunk_t, unroll,
        sublanes=S, itemsize=z_pack.dtype.itemsize,
        scratch_tiles=(2 * d + 2) if state == "vmem" else 0)

    eta_arr = jnp.asarray(eta, jnp.float32)
    per_lane = eta_arr.ndim == 2
    t = np.arange(1, T + 1, dtype=np.float32)
    isqrt = jnp.asarray(1.0 / np.sqrt(np.maximum(t, 1.0)))
    inv_t = jnp.asarray(1.0 / np.maximum(t, 1.0))
    if per_lane:
        assert eta_arr.shape == (S, B), eta_arr.shape
        scaleh = -0.5 * isqrt
        s2 = 0.25 * inv_t
        eta_in = [eta_arr]
        eta_specs = [pl.BlockSpec((S, lanes), lambda i, j, s1, s2: (0, i))]
    else:
        scaleh = (-0.5 * eta_arr) * isqrt
        s2 = (0.25 * eta_arr * eta_arr) * inv_t
        # Dummy (1, lanes)-shaped eta input keeps one kernel signature.
        eta_in = [jnp.zeros((S, B), jnp.float32)]
        eta_specs = [pl.BlockSpec((S, lanes), lambda i, j, s1, s2: (0, i))]

    if state == "vmem":
        kernel = functools.partial(
            _regret_kernel_dloop, ct=ct, d=d, db=min(d_block, d),
            nchunks=nchunks, alg_flag=alg_flag, per_lane=per_lane,
            unroll=u, dense=dense)
    else:
        kernel = functools.partial(
            _regret_kernel, ct=ct, d=d, nchunks=nchunks, alg_flag=alg_flag,
            per_lane=per_lane, unroll=u, dense=dense)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # scaleh, s2
        grid=(nb, nchunks),
        in_specs=eta_specs + [
            pl.BlockSpec((ct, d, S, lanes),
                         lambda i, j, s1, s2: (j, 0, 0, i)),
            pl.BlockSpec((ct, S, lanes),
                         lambda i, j, s1, s2: (j, 0, i)),
        ],
        out_specs=pl.BlockSpec((S, lanes), lambda i, j, s1, s2: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((d, S, lanes), jnp.float32),   # theta2
            pltpu.VMEM((d, S, lanes), jnp.float32),   # w = sum y z
            pltpu.VMEM((2, S, lanes), jnp.float32),   # [cum, cnt]
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(scaleh, s2, eta_in[0], z_pack, y_pack)
    return out


def _stream_kernel(scaleh_ref, s2_ref, th_in, w_in, sc_in, z_ref, y_ref,
                   th_out, w_out, sc_out, theta_acc, w_acc, sc_acc, *,
                   ct: int, d: int, nchunks: int, alg_flag: int,
                   unroll: int):
    """Carry-in/carry-out game chunk: advance (theta2, w, cum, cnt) over a
    (T_chunk, ...) packed block at fused-kernel speed.

    This is the streaming (long-horizon) twin of _regret_kernel: instead
    of starting from zeros and finalizing a regret, the state enters via
    the ``*_in`` refs and leaves via ``*_out`` — so horizons beyond HBM
    stream through repeated launches with an O(B d) carry, and the hinge-
    identity statistics (w, cnt) carried alongside make the comparator an
    O(d) epilogue with NO replay pass over the data (see stream_result).
    scaleh (T_chunk,) SMEM holds -eta/(2*sqrt(t)) with the GLOBAL round
    index t baked in by the caller; s2 holds eta^2/(4*max(1,t)).
    sc rows pack [cum, cnt].
    """
    chunk = pl.program_id(1)

    @pl.when(chunk == 0)
    def _init():
        theta_acc[:] = th_in[:]
        w_acc[:] = w_in[:]
        sc_acc[:] = sc_in[:]

    def one(k, state):
        theta2, w, cum, cnt = state
        z_t = [z_ref[k, j].astype(jnp.float32) for j in range(d)]
        y_t = y_ref[k].astype(jnp.float32)
        dotz2 = z_t[0] * theta2[0]
        nth2 = theta2[0] * theta2[0]
        for j in range(1, d):
            dotz2 = dotz2 + z_t[j] * theta2[j]
            nth2 = nth2 + theta2[j] * theta2[j]
        t_idx = chunk * ct + k
        if alg_flag == 0:
            clip = jax.lax.rsqrt(jnp.maximum(s2_ref[t_idx] * nth2, 1.0))
            diff = (scaleh_ref[t_idx] * clip) * dotz2 - y_t
        else:
            diff = _ftl_eff(nth2) * dotz2 - y_t
        s = jnp.sign(diff)
        cum = cum + diff * s
        theta2 = [theta2[j] + s * z_t[j] for j in range(d)]
        w = [w[j] + y_t * z_t[j] for j in range(d)]
        cnt = cnt + y_t * y_t
        return theta2, w, cum, cnt

    def body(i, state):
        for u in range(unroll):
            state = one(i * unroll + u, state)
        return state

    state0 = ([theta_acc[j] for j in range(d)], [w_acc[j] for j in range(d)],
              sc_acc[0], sc_acc[1])
    theta2, w, cum, cnt = jax.lax.fori_loop(0, ct // unroll, body, state0)
    for j in range(d):
        theta_acc[j] = theta2[j]
        w_acc[j] = w[j]
    sc_acc[0], sc_acc[1] = cum, cnt

    @pl.when(chunk == nchunks - 1)
    def _flush():
        th_out[:] = theta_acc[:]
        w_out[:] = w_acc[:]
        sc_out[:] = sc_acc[:]


def zero_stream_carry(B: int, d: int, S: int):
    """Fresh carry for ``play_packed_stream``: (theta2, w, [cum, cnt]) in
    packed lane layout (theta2 = 2*theta, losses un-halved — the kernels'
    internal conventions; ``stream_result`` undoes both).

    ``B`` is the PACKED LANE count (z_pack.shape[3] == n_sequences / S),
    not the sequence count — play_packed_stream asserts the match."""
    return (jnp.zeros((d, S, B), jnp.float32),
            jnp.zeros((d, S, B), jnp.float32),
            jnp.zeros((2, S, B), jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("alg_flag", "chunk_t", "unroll",
                                    "lanes_per_program", "interpret"))
def play_packed_stream(z_pack, y_pack, eta, t0, carry, *, alg_flag: int = 0,
                       chunk_t: int = 256, unroll: int = 16,
                       lanes_per_program: int = LANES,
                       interpret: bool = False):
    """Advance the streamed game over one packed time chunk.

    Args:
      z_pack: (T_chunk, d, S, B) f32/bf16; y_pack: (T_chunk, S, B).
      eta: scalar FTRL step scale (ignored for alg_flag=1).
      t0: number of rounds already played (traced scalar OK) — the global
        round index of row k is t0 + k + 1.  The index is carried in f32:
        integers are exact up to 2^24, so horizons beyond ~1.6e7 rounds
        accumulate ulp error in the FTRL scale (the scale varies as
        1/sqrt(t) — at t = 2^24 a 1-ulp index error shifts it by ~3e-8,
        far below f32 game noise, so this is a documentation bound, not a
        practical one).
      carry: (theta2 (d,S,B), w (d,S,B), sc (2,S,B) [cum, cnt]) from
        ``zero_stream_carry`` or a previous call.
    Returns: the advanced carry (same structure).
    """
    T, d, S, B = z_pack.shape
    assert S == sublanes_for(z_pack.dtype), (S, z_pack.dtype)
    th_in, w_in, sc_in = carry
    # Loud shape check: an oversized carry would otherwise be silently
    # block-sliced by the Pallas index map.
    assert th_in.shape == (d, S, B), (th_in.shape, (d, S, B))
    assert sc_in.shape == (2, S, B), (sc_in.shape, (2, S, B))
    lanes, ct, u, nchunks, nb = _choose_tiles(
        B, T, d, lanes_per_program, chunk_t, unroll,
        sublanes=S, itemsize=z_pack.dtype.itemsize)

    eta_arr = jnp.asarray(eta, jnp.float32)
    t = jnp.arange(1, T + 1, dtype=jnp.float32) + jnp.asarray(t0, jnp.float32)
    scaleh = (-0.5 * eta_arr) * jax.lax.rsqrt(jnp.maximum(t, 1.0))
    s2 = (0.25 * eta_arr * eta_arr) / jnp.maximum(t, 1.0)

    kernel = functools.partial(_stream_kernel, ct=ct, d=d, nchunks=nchunks,
                               alg_flag=alg_flag, unroll=u)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # scaleh, s2
        grid=(nb, nchunks),
        in_specs=[
            pl.BlockSpec((d, S, lanes), lambda i, j, s1, s2: (0, 0, i)),
            pl.BlockSpec((d, S, lanes), lambda i, j, s1, s2: (0, 0, i)),
            pl.BlockSpec((2, S, lanes), lambda i, j, s1, s2: (0, 0, i)),
            pl.BlockSpec((ct, d, S, lanes),
                         lambda i, j, s1, s2: (j, 0, 0, i)),
            pl.BlockSpec((ct, S, lanes), lambda i, j, s1, s2: (j, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((d, S, lanes), lambda i, j, s1, s2: (0, 0, i)),
            pl.BlockSpec((d, S, lanes), lambda i, j, s1, s2: (0, 0, i)),
            pl.BlockSpec((2, S, lanes), lambda i, j, s1, s2: (0, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, S, lanes), jnp.float32),
            pltpu.VMEM((d, S, lanes), jnp.float32),
            pltpu.VMEM((2, S, lanes), jnp.float32),
        ],
    )
    th, w, sc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((d, S, B), jnp.float32),
            jax.ShapeDtypeStruct((d, S, B), jnp.float32),
            jax.ShapeDtypeStruct((2, S, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(scaleh, s2, th_in, w_in, sc_in, z_pack, y_pack)
    return th, w, sc


@functools.partial(jax.jit,
                   static_argnames=("alg_flag", "chunk_t", "unroll",
                                    "lanes_per_program", "interpret"))
def play_packed_stream_many(z_stack, y_stack, eta, t0, carry, *,
                            alg_flag: int = 0, chunk_t: int = 256,
                            unroll: int = 16,
                            lanes_per_program: int = LANES,
                            interpret: bool = False):
    """Advance the streamed game over N stacked chunks in ONE dispatch.

    Args:
      z_stack: (N, T_chunk, d, S, B); y_stack: (N, T_chunk, S, B) —
        device-resident chunk stores (e.g. staged by a generation or IO
        pipeline).  A ``lax.scan`` chains the carry through the N kernel
        launches inside one jitted program, so the per-feed host dispatch
        round-trip (the dominant cost of Python-loop feeding through a
        remote runtime) is paid once per stack, not once per chunk.
    Returns: the advanced carry.
    """
    CT = z_stack.shape[1]

    def body(state, zy):
        c, t = state
        z_pack, y_pack = zy
        c = play_packed_stream(z_pack, y_pack, eta, t, c,
                               alg_flag=alg_flag, chunk_t=chunk_t,
                               unroll=unroll,
                               lanes_per_program=lanes_per_program,
                               interpret=interpret)
        return (c, t + CT), None

    (carry, _), _ = jax.lax.scan(
        body, (carry, jnp.asarray(t0, jnp.float32)), (z_stack, y_stack))
    return carry


@jax.jit
def stream_result(carry):
    """Regret + decomposition from a streamed carry via the hinge identity
    — no replay pass.  Returns (regret, cum_loss, comp_loss), each (S, B)
    f32 (halved back to reference scale)."""
    theta2, w, sc = carry
    nth = jnp.sum(theta2 * theta2, axis=0)
    dotw = jnp.sum(theta2 * w, axis=0)
    eff = jnp.where(nth > 0.0, -jax.lax.rsqrt(jnp.maximum(nth, 1e-30)), 0.0)
    comp2 = sc[1] - eff * dotw
    cum = 0.5 * sc[0]
    comp = 0.5 * comp2
    return cum - comp, cum, comp


def pack_time_major(z_chunk, y_chunk, dtype=jnp.float32,
                    *, validate: bool = False):
    """Time-major (CT, B, d) / (CT, B) chunk -> packed kernel layout
    ((CT, d, S, B'), (CT, S, B')); B is padded to a full lane tile with
    inert zero rows.  Sequence order matches ``pack_sequences``.
    ``validate=True`` enforces the identity-kernel data contract
    (||z_t||_2 <= 1 per row, y in {-1, 0, +1}) like ``pack_sequences``
    — external streams violating it would corrupt the carried
    comparator statistics silently.  Costs a device sync."""
    z = jnp.asarray(z_chunk)
    y = jnp.asarray(y_chunk)
    CT, B, d = z.shape
    if validate:
        max_norm = float(jnp.max(jnp.sum(z * z, axis=-1)))
        if max_norm > 1.0 + 1e-5:
            raise ValueError(
                f"rows must lie in the unit L2 ball (max ||z||^2 = "
                f"{max_norm:.6f}); clip rows like the data builders do")
        bad_y = float(jnp.max(jnp.abs(y * y * y - y)))
        if bad_y > 1e-6:
            raise ValueError("labels must be in {-1, 0, +1}")
    S = sublanes_for(dtype)
    seq_tile = LANES * S
    pad_b = (-B) % seq_tile
    z = jnp.pad(z.astype(dtype), ((0, 0), (0, pad_b), (0, 0)))
    y = jnp.pad(y.astype(dtype), ((0, 0), (0, pad_b)))
    nb = (B + pad_b) // seq_tile
    z_pack = (z.reshape(CT, nb, S, LANES, d)
               .transpose(0, 4, 2, 1, 3)
               .reshape(CT, d, S, nb * LANES))
    y_pack = (y.reshape(CT, nb, S, LANES)
               .transpose(0, 2, 1, 3)
               .reshape(CT, S, nb * LANES))
    return z_pack, y_pack


def _synthetic_kernel(eta_ref, seed_ref, out_ref, theta_acc, w_acc,
                      cum_acc, z_buf, y_buf, *, ct: int, d: int,
                      nchunks: int, alg_flag: int, unroll: int):
    """Self-generating game: z, y are drawn from the on-core PRNG chunk by
    chunk (Rademacher rows scaled 1/sqrt(d) — exact unit-norm rows, so no
    clipping branch), played forward in ONE pass.  Zero HBM data traffic,
    and no regeneration pass: the comparator is scored via the hinge
    identity from the carried w = sum y_t z_t (labels are exactly ±1 here,
    so cnt == T statically; see ops/pallas_smart.py for the identity).

    The FTRL step scale is computed IN-KERNEL from the round index
    (scale = -eta * rsqrt(t), one scalar-unit rsqrt per step) instead of a
    prefetched (T,) SMEM table — nothing in the launch scales with T, so
    a single launch runs ARBITRARY horizons (T = 2^20+) at fixed VMEM.
    eta (1,) SMEM; seed (1,) SMEM.
    """
    i = pl.program_id(0)
    chunk = pl.program_id(1)

    @pl.when(chunk == 0)
    def _init():
        theta_acc[:] = jnp.zeros_like(theta_acc)
        w_acc[:] = jnp.zeros_like(w_acc)
        cum_acc[:] = jnp.zeros_like(cum_acc)

    pltpu.prng_seed(seed_ref[0] + i * nchunks + chunk)
    neg_eta = -eta_ref[0]
    inv_sqrt_d = 1.0 / float(np.sqrt(d))
    zb = pltpu.prng_random_bits(z_buf.shape)
    z_buf[:] = jnp.where((zb & 1) == 1, inv_sqrt_d, -inv_sqrt_d)
    yb = pltpu.prng_random_bits(y_buf.shape)
    y_buf[:] = jnp.where((yb & 1) == 1, 1.0, -1.0)

    def one(k, state):
        theta, w, cum = state
        z_t = [z_buf[k, jj] for jj in range(d)]
        y_t = y_buf[k]
        if alg_flag == 0:
            t_f = (chunk * ct + k + 1).astype(jnp.float32)
            scale = neg_eta * jax.lax.rsqrt(t_f)
            eff_fn = functools.partial(_ftrl_eff, scale)
        else:
            eff_fn = _ftl_eff
        theta, cum = _play_step(z_t, y_t, theta, cum, eff_fn)
        w = [w[jj] + y_t * z_t[jj] for jj in range(d)]
        return theta, w, cum

    def body(b, state):
        for u in range(unroll):
            state = one(b * unroll + u, state)
        return state

    state0 = ([theta_acc[j] for j in range(d)],
              [w_acc[j] for j in range(d)], cum_acc[:])
    theta, w, cum = jax.lax.fori_loop(0, ct // unroll, body, state0)
    for j in range(d):
        theta_acc[j] = theta[j]
        w_acc[j] = w[j]
    cum_acc[:] = cum

    @pl.when(chunk == nchunks - 1)
    def _finalize():
        nth = theta_acc[0] * theta_acc[0]
        dotw = theta_acc[0] * w_acc[0]
        for j in range(1, d):
            nth = nth + theta_acc[j] * theta_acc[j]
            dotw = dotw + theta_acc[j] * w_acc[j]
        effC = _ftl_eff(nth)
        comp = 0.5 * (float(nchunks * ct) - effC * dotw)
        out_ref[:] = cum_acc[:] - comp


@functools.partial(jax.jit,
                   static_argnames=("T", "lane_batch", "d", "alg_flag",
                                    "chunk_t", "unroll", "lanes_per_program",
                                    "interpret"))
def synthetic_regrets(seed, eta0, *, T: int, lane_batch: int, d: int = 5,
                      alg_flag: int = 0, chunk_t: int = 256, unroll: int = 4,
                      lanes_per_program: int = 4 * LANES,
                      interpret: bool = False):
    """Full regret evaluation on PRNG-generated sequences, never touching
    HBM for data — the per-chip speed-of-light mode, and the generation
    strategy for pod-scale sweeps (each device owns disjoint seeds).

    ``eta0`` is the FTRL step size (scalar; the per-round scale is derived
    in-kernel, so nothing in the launch scales with T — T = 2^20 runs as
    ONE launch).  Returns (8, lane_batch) regrets for 8 * lane_batch
    sequences.
    """
    B = lane_batch
    lanes, ct, u, nchunks, nb = _choose_tiles(
        B, T, d, lanes_per_program, chunk_t, unroll)

    kernel = functools.partial(_synthetic_kernel, ct=ct, d=d,
                               nchunks=nchunks, alg_flag=alg_flag, unroll=u)
    seed_arr = jnp.asarray([seed], jnp.int32)
    eta_arr = jnp.asarray([eta0], jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # eta, seed
        grid=(nb, nchunks),
        in_specs=[],
        out_specs=pl.BlockSpec((SUBLANES, lanes), lambda i, j, s1, s2: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((d, SUBLANES, lanes), jnp.float32),   # theta
            pltpu.VMEM((d, SUBLANES, lanes), jnp.float32),   # w = sum y z
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),      # cum
            pltpu.VMEM((ct, d, SUBLANES, lanes), jnp.float32),  # z chunk
            pltpu.VMEM((ct, SUBLANES, lanes), jnp.float32),     # y chunk
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((SUBLANES, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(eta_arr, seed_arr)
    return out


def ftrl_scales(T: int, eta0: float) -> jnp.ndarray:
    """Per-round scales -(eta0/sqrt(max(1, t))), t = 1..T (f32)."""
    t = np.arange(1, T + 1, dtype=np.float32)
    return jnp.asarray(-(np.float32(eta0) / np.sqrt(np.maximum(t, 1.0))))


def _comparator_epilogue(z_pack, y_pack, cum, theta):
    """Final-FTL comparator replay as an XLA epilogue: regrets = cum - comp."""
    nth = jnp.sum(theta * theta, axis=0, keepdims=False)         # (S, B)
    eff = jnp.where(nth > 0.0, -jax.lax.rsqrt(jnp.maximum(nth, 1e-30)), 0.0)
    # q_all[t] = eff * <z_t, theta>; comparator loss = sum 0.5|q_all - y|.
    q = jnp.einsum("tdsb,dsb->tsb", z_pack, theta,
                   preferred_element_type=jnp.float32)
    comp = 0.5 * jnp.sum(jnp.abs(eff[None] * q
                                 - y_pack.astype(jnp.float32)), axis=0)
    return cum - comp


@functools.partial(jax.jit, static_argnames=("alg_flag", "chunk_t", "unroll",
                                             "lanes_per_program", "interpret"))
def regrets_packed(z_pack, y_pack, scales, *, alg_flag: int = 0,
                   chunk_t: int = 256, unroll: int = 4,
                   lanes_per_program: int = 4 * LANES,
                   interpret: bool = False):
    """cum/theta from the kernel + comparator epilogue => regrets (S, B)."""
    cum, theta = play_packed(z_pack, y_pack, scales, alg_flag=alg_flag,
                             chunk_t=chunk_t, unroll=unroll,
                             lanes_per_program=lanes_per_program,
                             interpret=interpret)
    return _comparator_epilogue(z_pack, y_pack, cum, theta)


@functools.partial(jax.jit, static_argnames=("chunk_t", "unroll",
                                             "lanes_per_program", "interpret"))
def regrets_packed_eta(z_pack, y_pack, eta_pack, *, chunk_t: int = 256,
                       unroll: int = 4, lanes_per_program: int = 4 * LANES,
                       interpret: bool = False):
    """Per-sequence-eta FTRL regrets (mixed-eta scenario batches)."""
    cum, theta = play_packed_eta(z_pack, y_pack, eta_pack, chunk_t=chunk_t,
                                 unroll=unroll,
                                 lanes_per_program=lanes_per_program,
                                 interpret=interpret)
    return _comparator_epilogue(z_pack, y_pack, cum, theta)


def pack_sequences(z: jnp.ndarray, y: jnp.ndarray, dtype=jnp.float32,
                   *, validate: bool = False, y_dtype=None):
    """(B, T, d) / (B, T) -> packed kernel layout; returns (z_pack, y_pack, B).

    dtype selects HBM storage: f32 (8 sublanes) or bf16 (16 sublanes, half
    the traffic; labels stay exact, z rows round to bf16).

    y_dtype (default: same as ``dtype``) selects the LABEL stream's
    storage independently — ``jnp.int8`` is value-exact (labels are
    {-1, 0, +1} by contract; kernels convert to f32 on read) and cuts
    per-step HBM traffic 12 -> 11 bytes, measured +4-5% on the
    HBM-bound kernels (docs/BENCHMARKS.md roofline; the compute-bound
    SMART kernel gains nothing).

    validate=True enforces the identity-kernel data contract on host
    (||z_t||_2 <= 1 per row, y in {-1, 0, +1}) — the framework's builders
    guarantee it, but external data violating it would corrupt the
    identity-based comparator silently.  Costs a device sync; off by
    default on the hot path.
    """
    B, T, d = z.shape
    if validate:
        max_norm = float(jnp.max(jnp.sum(z * z, axis=-1)))
        if max_norm > 1.0 + 1e-5:
            raise ValueError(
                f"rows must lie in the unit L2 ball (max ||z||^2 = "
                f"{max_norm:.6f}); clip rows like the data builders do")
        bad_y = float(jnp.max(jnp.abs(y * y * y - y)))
        if bad_y > 1e-6:
            raise ValueError("labels must be in {-1, 0, +1}")
    S = sublanes_for(dtype)
    seq_tile = LANES * S
    pad_b = (-B) % seq_tile
    z = jnp.pad(z.astype(dtype), ((0, pad_b), (0, 0), (0, 0)))
    y = jnp.pad(y.astype(y_dtype if y_dtype is not None else dtype),
                ((0, pad_b), (0, 0)))
    Bp = B + pad_b
    nb = Bp // seq_tile
    # (B, T, d) -> (T, d, S, 128*nb): sequence index b = (g, s, l) with the
    # lane-fastest order matching the block index map.
    z_pack = (z.reshape(nb, S, LANES, T, d)
               .transpose(3, 4, 1, 0, 2)
               .reshape(T, d, S, nb * LANES))
    y_pack = (y.reshape(nb, S, LANES, T)
               .transpose(3, 1, 0, 2)
               .reshape(T, S, nb * LANES))
    return z_pack, y_pack, B


def unpack_result(res_SB: jnp.ndarray, B: int) -> jnp.ndarray:
    """(S, nb*128) kernel output -> (B,) in original sequence order."""
    S, BL = res_SB.shape
    nb = BL // LANES
    out = (res_SB.reshape(S, nb, LANES)
           .transpose(1, 0, 2)
           .reshape(nb * S * LANES))
    return out[:B]


def pack_per_seq(vals: jnp.ndarray, S: int) -> jnp.ndarray:
    """(B,) per-sequence values -> (S, nb*128) kernel lane layout (the
    inverse of ``unpack_result``), e.g. per-sequence eta grids."""
    B = vals.shape[0]
    seq_tile = LANES * S
    pad_b = (-B) % seq_tile
    v = jnp.pad(vals.astype(jnp.float32), (0, pad_b))
    nb = (B + pad_b) // seq_tile
    return v.reshape(nb, S, LANES).transpose(1, 0, 2).reshape(S, nb * LANES)


# Kernel d-envelope (VERDICT round-2 task 4; extended past the register
# boundary in round 5, task 2).  The kernel family is structurally
# d-general and the per-step work is ~3d full-width VPU ops per lane, so
# throughput falls ~1/d (measured on chip, T=1024: 2.2e10 / 8.7e9 /
# 4.8e9 / 2.5e9 / 1.1-1.3e9 steps/s at d = 5/16/32/64/128 with the
# register-state kernel, then 4.9e8 at d=256 (bf16) and 1.5e8 at d=512
# (f32 — bf16's 16-sublane f32 state exceeds the VMEM budget there) with
# the VMEM-state d-loop kernel).  The XLA scan NEVER catches up: 4.3e7
# at d=256 and 2.2e7 at d=512 — the kernel still leads 11x / 6.7x at
# the boundary (docs/BENCHMARKS.md "Kernel d-envelope", BENCH_DETAILS
# d_envelope_* records).  _D_KERNEL_MAX remains the measured boundary,
# not a crossover: beyond it the auto dispatcher routes to the scan
# because the kernel is unmeasured there, not because the scan won.
# State routing: register-state through d <= _D_REG_STATE_MAX (1.24x
# the VMEM-state kernel at their d=128 overlap), VMEM-state beyond.
_D_KERNEL_MAX = 512


def kernel_envelope(B: int, T: int, d: int, dtype=jnp.float32,
                    per_lane_eta: bool = False):
    """None if the packed game kernel is the right engine for this shape;
    otherwise a human-readable reason for taking the XLA scan.

    ``per_lane_eta``: the (B,)-eta path runs the PER-LANE-ETA kernel
    (_game_eta_kernel), which only exists in register-state form — its
    envelope stays at the register boundary d <= _D_REG_STATE_MAX; the
    scalar-eta kernels have VMEM-state twins through _D_KERNEL_MAX."""
    if per_lane_eta and d > _D_REG_STATE_MAX:
        return (f"d={d} past the register-state boundary "
                f"(d<={_D_REG_STATE_MAX}) and the per-lane-eta kernel "
                f"has no VMEM-state twin")
    if d > _D_KERNEL_MAX:
        return (f"d={d} past the measured kernel envelope "
                f"(d<={_D_KERNEL_MAX}; the kernel still led the scan "
                f"6.7x at the boundary, but is unmeasured beyond it)")
    S = sublanes_for(dtype)
    itemsize = jnp.dtype(dtype).itemsize
    Bp = -(-B // (S * LANES)) * LANES        # packed lane dim
    try:
        _choose_tiles(Bp, T, d, 4 * LANES, 256, 4, sublanes=S,
                      itemsize=itemsize,
                      scratch_tiles=(d + 1) if d > _D_REG_STATE_MAX else 0)
    except ValueError as e:                   # VMEM budget exceeded
        return str(e)
    return None


def simulate_linear_auto(z, y, alg_flag: int, eta0, *,
                         interpret: bool = False):
    """Regret evaluation with automatic kernel/scan dispatch: the packed
    Pallas kernel inside its measured envelope (d <= crossover, VMEM
    budget), the XLA scan past it — same values either way (the scan IS
    the parity reference the kernel is tested against).  Returns (B,)
    regrets."""
    z = jnp.asarray(z)
    y = jnp.asarray(y)
    B, T, d = z.shape
    per_lane = getattr(jnp.asarray(eta0), "ndim", 0) == 1
    if kernel_envelope(B, T, d, per_lane_eta=per_lane) is None:
        return simulate_linear_pallas_v2(z, y, alg_flag, eta0,
                                         interpret=interpret)
    from online_convex_optimization_tpu.models.linear import (
        simulate_linear_batch)
    return simulate_linear_batch(z, y, alg_flag, eta0).regret


def simulate_linear_pallas_v2(z, y, alg_flag: int, eta0, *,
                              dtype=jnp.float32, interpret: bool = False):
    """Drop-in batched regret evaluation via the v2 kernel ((B,T,d) API).

    ``eta0`` may be a scalar (shared step size) or a (B,) array (per-
    sequence step sizes -> the per-lane-eta kernel).
    """
    z = jnp.asarray(z)
    y = jnp.asarray(y)
    T = z.shape[1]
    z_pack, y_pack, B = pack_sequences(z, y, dtype)
    eta_arr = jnp.asarray(eta0, jnp.float32)
    if eta_arr.ndim == 1:
        assert alg_flag == 0, "per-sequence eta is FTRL-only"
        eta_pack = pack_per_seq(eta_arr, z_pack.shape[2])
        reg = regrets_packed_eta(z_pack, y_pack, eta_pack,
                                 interpret=interpret)
    else:
        scales = ftrl_scales(T, float(eta0))
        reg = regrets_packed(z_pack, y_pack, scales, alg_flag=alg_flag,
                             interpret=interpret)
    return unpack_result(reg, B)
