"""Pallas game kernel v2: 1024 sequences per tile, feature dim in registers.

Layout rationale (v1 in pallas_step.py puts d on sublanes, wasting 3/8 of
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
  - zero-padding (z rows AND y entries zero) is loss- and gradient-neutral
    (q = 0, diff = 0), so heterogeneous horizons need no masks.

The comparator replay (final FTL action scored over the sequence,
fast_algorithms.py:113-115) runs as an XLA epilogue: one fused
multiply-reduce over the packed z — bandwidth-bound and overlappable,
not worth a second kernel pass.

This is the f32 throughput path; parity semantics live in the x64 scan.
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
SEQ_TILE = LANES * SUBLANES  # sequences per grid program


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


def _comparator_from(theta_acc, xc_acc, d):
    """Write the final FTL action into xc_acc from the theta scratch."""
    nth = theta_acc[0] * theta_acc[0]
    for j in range(1, d):
        nth = nth + theta_acc[j] * theta_acc[j]
    eff = _ftl_eff(nth)
    for j in range(d):
        xc_acc[j] = eff * theta_acc[j]


def _replay_chunk(ct, read_z, read_y, xc_acc, d, comp0):
    """Comparator loss of xc over ``ct`` rounds; returns the accumulated sum."""

    def one(k, comp):
        q = read_z(k, 0) * xc_acc[0]
        for j in range(1, d):
            q = q + read_z(k, j) * xc_acc[j]
        return comp + 0.5 * jnp.abs(q - read_y(k))

    return jax.lax.fori_loop(0, ct, one, comp0)


def _choose_tiles(B, T, d, lanes_per_program, chunk_t, unroll):
    """Pick (lanes, ct, unroll, nchunks, nb): lanes is a 128-multiple
    divisor of B; ct a power-of-two divisor of T sized so the
    double-buffered z block stays inside the VMEM budget."""
    assert B % LANES == 0, B
    lanes = min(lanes_per_program, B)
    lanes -= lanes % LANES
    while B % lanes:
        lanes -= LANES
    vmem_budget = 11 * 1024 * 1024
    while vmem_budget // (2 * d * SUBLANES * lanes * 4) < 8 and lanes > LANES:
        lanes = max(lanes // 2 - (lanes // 2) % LANES, LANES)
        while B % lanes:
            lanes -= LANES
    bound = vmem_budget // (2 * d * SUBLANES * lanes * 4)
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
        z_t = [z_ref[k, j] for j in range(d)]
        if alg_flag == 0:
            eff_fn = functools.partial(_ftrl_eff, scale_ref[chunk * ct + k])
        else:
            eff_fn = _ftl_eff
        return _play_step(z_t, y_ref[k], theta, cum, eff_fn)

    _play_chunk(ct, unroll, one, theta_acc, cum_acc, d)

    @pl.when(chunk == nchunks - 1)
    def _finalize():
        cum_ref[:] = cum_acc[:]
        for j in range(d):
            theta_ref[j] = theta_acc[j]


@functools.partial(jax.jit,
                   static_argnames=("alg_flag", "chunk_t", "unroll",
                                    "lanes_per_program", "interpret"))
def play_packed(z_pack: jnp.ndarray, y_pack: jnp.ndarray, scales: jnp.ndarray,
                *, alg_flag: int = 0, chunk_t: int = 256, unroll: int = 4,
                lanes_per_program: int = 4 * LANES, interpret: bool = False):
    """Run the online game on packed inputs.

    Args:
      z_pack: (T, d, 8, B) f32, B % 128 == 0, T % chunk_t == 0.
      y_pack: (T, 8, B) f32 (zero rows are inert padding).
      scales: (T,) f32 per-round FTRL scale -(eta0/sqrt(max(1,t))).
      lanes_per_program: preferred width each grid program owns; >128
        interleaves multiple independent lane-tiles per op to hide the
        per-step dependency-chain latency.  Reduced automatically to a
        128-multiple divisor of B; the effective time-chunk is then
        clamped (overriding ``chunk_t``) so the double-buffered z block
        stays inside the VMEM budget.
    Returns:
      (cum_loss (8, B), theta (d, 8, B)).
    """
    T, d, S, B = z_pack.shape
    assert S == SUBLANES, S
    lanes, ct, unroll, nchunks, nb = _choose_tiles(
        B, T, d, lanes_per_program, chunk_t, unroll)

    kernel = functools.partial(_game_kernel, ct=ct, d=d, nchunks=nchunks,
                               alg_flag=alg_flag, unroll=unroll)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # scales
        grid=(nb, nchunks),
        in_specs=[
            pl.BlockSpec((ct, d, SUBLANES, lanes), lambda i, j, s: (j, 0, 0, i)),
            pl.BlockSpec((ct, SUBLANES, lanes), lambda i, j, s: (j, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((SUBLANES, lanes), lambda i, j, s: (0, i)),
            pl.BlockSpec((d, SUBLANES, lanes), lambda i, j, s: (0, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, SUBLANES, lanes), jnp.float32),
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),
        ],
    )
    cum, theta = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((SUBLANES, B), jnp.float32),
            jax.ShapeDtypeStruct((d, SUBLANES, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(scales, z_pack, y_pack)
    return cum, theta


def _sweep_kernel(isqrt_ref, eta_ref, z_ref, y_ref, out_ref,
                  theta_acc, cum_acc, xc_acc, *, ct: int, d: int,
                  nchunks: int, unroll: int):
    """FTRL game + comparator replay for one (lane-batch, eta-setting,
    time-chunk-phase) grid step.

    The hyperparameter grid is a *grid dimension*: each (i, e) pass
    replays the same z/y blocks (re-streamed from HBM by the pipeline)
    under a different scalar eta — the (sequence x setting) cross product
    costs no input duplication.  The last grid axis runs 2*nchunks steps:
    phase 0 plays the game, phase 1 re-streams the same blocks to score
    the final-FTL comparator, so regrets finish entirely in-kernel.
    isqrt (T,) SMEM holds 1/sqrt(max(1,t)); eta (E,) SMEM.
    """
    e = pl.program_id(1)
    j_step = pl.program_id(2)
    chunk = j_step % nchunks
    replay = j_step >= nchunks
    eta = eta_ref[e]

    @pl.when(j_step == 0)
    def _init():
        theta_acc[:] = jnp.zeros_like(theta_acc)
        cum_acc[:] = jnp.zeros_like(cum_acc)

    @pl.when(jnp.logical_not(replay))
    def _play():
        def one(k, theta, cum):
            z_t = [z_ref[k, j] for j in range(d)]
            scale = -eta * isqrt_ref[chunk * ct + k]
            return _play_step(z_t, y_ref[k], theta, cum,
                              functools.partial(_ftrl_eff, scale))

        _play_chunk(ct, unroll, one, theta_acc, cum_acc, d)

    @pl.when(replay)
    def _replay():
        @pl.when(j_step == nchunks)
        def _comparator_action():
            _comparator_from(theta_acc, xc_acc, d)

        # Accumulate the comparator loss as a negative contribution so the
        # out block holds cum - comp once the phase completes.
        comp = _replay_chunk(ct, lambda k, j: z_ref[k, j],
                             lambda k: y_ref[k], xc_acc, d,
                             jnp.zeros_like(cum_acc[:]))
        cum_acc[:] = cum_acc[:] - comp

    @pl.when(j_step == 2 * nchunks - 1)
    def _finalize():
        out_ref[0] = cum_acc[:]


@functools.partial(jax.jit,
                   static_argnames=("chunk_t", "unroll", "lanes_per_program",
                                    "interpret"))
def eta_sweep_packed(z_pack, y_pack, eta_grid, *, chunk_t: int = 256,
                     unroll: int = 4, lanes_per_program: int = 4 * LANES,
                     interpret: bool = False):
    """FTRL regrets for every (sequence, eta0) pair at fused-kernel speed.

    Args:
      z_pack: (T, d, 8, B); y_pack: (T, 8, B); eta_grid: (E,) f32.
    Returns: (E, 8, B) regrets — BASELINE config 2 ("learning-rate sweep
    over 64 settings") as one kernel launch.
    """
    T, d, S, B = z_pack.shape
    E = eta_grid.shape[0]
    assert S == SUBLANES, S
    lanes, ct, u, nchunks, nb = _choose_tiles(
        B, T, d, lanes_per_program, chunk_t, unroll)

    t = np.arange(1, T + 1, dtype=np.float32)
    isqrt = jnp.asarray(1.0 / np.sqrt(np.maximum(t, 1.0)))
    eta_grid = jnp.asarray(eta_grid, jnp.float32)

    kernel = functools.partial(_sweep_kernel, ct=ct, d=d, nchunks=nchunks,
                               unroll=u)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # isqrt, eta_grid
        grid=(nb, E, 2 * nchunks),
        in_specs=[
            pl.BlockSpec((ct, d, SUBLANES, lanes),
                         lambda i, e, j, s1, s2: (j % nchunks, 0, 0, i)),
            pl.BlockSpec((ct, SUBLANES, lanes),
                         lambda i, e, j, s1, s2: (j % nchunks, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, SUBLANES, lanes),
                               lambda i, e, j, s1, s2: (e, 0, i)),
        scratch_shapes=[
            pltpu.VMEM((d, SUBLANES, lanes), jnp.float32),
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),
            pltpu.VMEM((d, SUBLANES, lanes), jnp.float32),
        ],
    )
    regrets = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, SUBLANES, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(isqrt, eta_grid, z_pack, y_pack)
    return regrets


def _synthetic_kernel(scale_ref, seed_ref, out_ref, theta_acc, cum_acc,
                      comp_acc, xc_acc, z_buf, y_buf, *, ct: int, d: int,
                      nchunks: int, alg_flag: int, unroll: int):
    """Self-generating game: z, y are drawn from the on-core PRNG chunk by
    chunk (Rademacher rows scaled 1/sqrt(d) — exact unit-norm rows, so no
    clipping branch), played forward in phase 0 and regenerated bit-for-bit
    (same per-chunk seeds) for the comparator replay in phase 1.  Zero HBM
    traffic: the sequences never exist outside VMEM.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    chunk = j % nchunks
    replay_phase = j >= nchunks

    @pl.when(j == 0)
    def _init():
        theta_acc[:] = jnp.zeros_like(theta_acc)
        cum_acc[:] = jnp.zeros_like(cum_acc)
        comp_acc[:] = jnp.zeros_like(comp_acc)

    # Same seed for chunk k in both phases => identical regenerated data.
    pltpu.prng_seed(seed_ref[0] + i * nchunks + chunk)
    inv_sqrt_d = 1.0 / float(np.sqrt(d))
    zb = pltpu.prng_random_bits(z_buf.shape)
    z_buf[:] = jnp.where((zb & 1) == 1, inv_sqrt_d, -inv_sqrt_d)
    yb = pltpu.prng_random_bits(y_buf.shape)
    y_buf[:] = jnp.where((yb & 1) == 1, 1.0, -1.0)

    @pl.when(jnp.logical_not(replay_phase))
    def _play():
        def one(k, theta, cum):
            z_t = [z_buf[k, jj] for jj in range(d)]
            if alg_flag == 0:
                eff_fn = functools.partial(_ftrl_eff,
                                           scale_ref[chunk * ct + k])
            else:
                eff_fn = _ftl_eff
            return _play_step(z_t, y_buf[k], theta, cum, eff_fn)

        _play_chunk(ct, unroll, one, theta_acc, cum_acc, d)

    @pl.when(replay_phase)
    def _replay():
        @pl.when(j == nchunks)
        def _comparator_action():
            _comparator_from(theta_acc, xc_acc, d)

        comp_acc[:] = _replay_chunk(ct, lambda k, jj: z_buf[k, jj],
                                    lambda k: y_buf[k], xc_acc, d,
                                    comp_acc[:])

    @pl.when(j == 2 * nchunks - 1)
    def _finalize():
        out_ref[:] = cum_acc[:] - comp_acc[:]


@functools.partial(jax.jit,
                   static_argnames=("T", "lane_batch", "d", "alg_flag",
                                    "chunk_t", "unroll", "lanes_per_program",
                                    "interpret"))
def synthetic_regrets(seed, scales, *, T: int, lane_batch: int, d: int = 5,
                      alg_flag: int = 0, chunk_t: int = 256, unroll: int = 4,
                      lanes_per_program: int = 4 * LANES,
                      interpret: bool = False):
    """Full regret evaluation on PRNG-generated sequences, never touching
    HBM for data — the per-chip speed-of-light mode, and the generation
    strategy for pod-scale sweeps (each device owns disjoint seeds).

    Returns (8, lane_batch) regrets for 8 * lane_batch sequences.
    """
    B = lane_batch
    lanes, ct, u, nchunks, nb = _choose_tiles(
        B, T, d, lanes_per_program, chunk_t, unroll)

    kernel = functools.partial(_synthetic_kernel, ct=ct, d=d,
                               nchunks=nchunks, alg_flag=alg_flag, unroll=u)
    seed_arr = jnp.asarray([seed], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # scales, seed
        grid=(nb, 2 * nchunks),
        in_specs=[],
        out_specs=pl.BlockSpec((SUBLANES, lanes), lambda i, j, s1, s2: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((d, SUBLANES, lanes), jnp.float32),   # theta
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),      # cum
            pltpu.VMEM((SUBLANES, lanes), jnp.float32),      # comp
            pltpu.VMEM((d, SUBLANES, lanes), jnp.float32),   # x_c
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
    )(scales, seed_arr)
    return out


def ftrl_scales(T: int, eta0: float) -> jnp.ndarray:
    """Per-round scales -(eta0/sqrt(max(1, t))), t = 1..T (f32)."""
    t = np.arange(1, T + 1, dtype=np.float32)
    return jnp.asarray(-(np.float32(eta0) / np.sqrt(np.maximum(t, 1.0))))


@functools.partial(jax.jit, static_argnames=("alg_flag", "chunk_t", "unroll",
                                             "lanes_per_program", "interpret"))
def regrets_packed(z_pack, y_pack, scales, *, alg_flag: int = 0,
                   chunk_t: int = 256, unroll: int = 4,
                   lanes_per_program: int = 4 * LANES,
                   interpret: bool = False):
    """cum/theta from the kernel + comparator epilogue => regrets (8, B)."""
    cum, theta = play_packed(z_pack, y_pack, scales, alg_flag=alg_flag,
                             chunk_t=chunk_t, unroll=unroll,
                             lanes_per_program=lanes_per_program,
                             interpret=interpret)
    nth = jnp.sum(theta * theta, axis=0, keepdims=False)         # (8, B)
    eff = jnp.where(nth > 0.0, -jax.lax.rsqrt(jnp.maximum(nth, 1e-30)), 0.0)
    # q_all[t] = eff * <z_t, theta>; comparator loss = sum 0.5|q_all - y|.
    q = jnp.einsum("tdsb,dsb->tsb", z_pack, theta,
                   preferred_element_type=jnp.float32)
    comp = 0.5 * jnp.sum(jnp.abs(eff[None] * q - y_pack), axis=0)
    return cum - comp


def pack_sequences(z: jnp.ndarray, y: jnp.ndarray):
    """(B, T, d) / (B, T) -> packed kernel layout; returns (z_pack, y_pack, B)."""
    B, T, d = z.shape
    pad_b = (-B) % SEQ_TILE
    z = jnp.pad(z.astype(jnp.float32), ((0, pad_b), (0, 0), (0, 0)))
    y = jnp.pad(y.astype(jnp.float32), ((0, pad_b), (0, 0)))
    Bp = B + pad_b
    nb = Bp // SEQ_TILE
    # (B, T, d) -> (T, d, 8, 128*nb): sequence index b = (g, s, l) with the
    # lane-fastest order matching the block index map.
    z_pack = (z.reshape(nb, SUBLANES, LANES, T, d)
               .transpose(3, 4, 1, 0, 2)
               .reshape(T, d, SUBLANES, nb * LANES))
    y_pack = (y.reshape(nb, SUBLANES, LANES, T)
               .transpose(3, 1, 0, 2)
               .reshape(T, SUBLANES, nb * LANES))
    return z_pack, y_pack, B


def unpack_result(res_8B: jnp.ndarray, B: int) -> jnp.ndarray:
    """(8, nb*128) kernel output -> (B,) in original sequence order."""
    S, BL = res_8B.shape
    nb = BL // LANES
    out = (res_8B.reshape(SUBLANES, nb, LANES)
           .transpose(1, 0, 2)
           .reshape(nb * SEQ_TILE))
    return out[:B]


def simulate_linear_pallas_v2(z, y, alg_flag: int, eta0, *,
                              interpret: bool = False):
    """Drop-in batched regret evaluation via the v2 kernel ((B,T,d) API)."""
    z = jnp.asarray(z)
    y = jnp.asarray(y)
    T = z.shape[1]
    z_pack, y_pack, B = pack_sequences(z, y)
    scales = ftrl_scales(T, float(eta0))
    reg = regrets_packed(z_pack, y_pack, scales, alg_flag=alg_flag,
                         interpret=interpret)
    return unpack_result(reg, B)
