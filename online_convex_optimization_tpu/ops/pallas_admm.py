"""Pallas all-prefix ADMM: the exact-FTL device solve with VMEM-resident
consensus state.

Each prefix row is an INDEPENDENT little ADMM, so:

  - rows (replicate x prefix) tile the grid in blocks of ``block_rows``;
  - each block DMAs its S, U rows into VMEM ONCE, runs its entire
    iteration loop there (zero HBM traffic per iteration), and exits as
    soon as ITS OWN residual clears the tolerance — finishing blocks
    stop hundreds of iterations before the global worst;
  - the per-row (d x d) normal-matrix Cholesky factors are precomputed
    (one XLA pass over the Gram cumsum — the running-sufficient-
    statistics recast of BASELINE config 3) and applied in-kernel as
    d-unrolled triangular substitutions on (rows, 1) register tiles.

Math and state layout mirror _admm_all_prefixes exactly (same splitting,
over-relaxation, soft-threshold, l2 ball projection, residual), so the
warm-continuation/escalation contract carries over: the state returned
here continues in this kernel OR in the XLA path.

MEASURED OUTCOME (recorded honestly): on chip this kernel exactly
MATCHES the banded XLA formulation (0.91 vs 0.93 s on the T=1000 x
16-replicate cell) — the band solve is VPU-compute-bound, not HBM-bound,
so VMEM residency buys nothing once the XLA path is banded.  It is kept
as the validated kernel formulation of the exact track (selectable via
evaluate_stream_exact(solver="kernel") / --exact-solver kernel), and as
the base to revisit if the compute balance ever changes.  Also measured:
replacing the VPU rowsum/FMA forms with MXU dots is SLOWER and WRONG
(Mosaic truncates f32 MXU inputs to bf16 — preferred_element_type only
sets the accumulator — stalling the residual at ~8e-2); block_rows=256
is the VMEM sweet spot (512 exceeds the 16 MB scoped limit, 128 is ~9%
slower).

l2 norm only (the production default); linf/l1 stay on the XLA path.
Reference semantics: /root/reference/exact_ftl.py:62-193 (build-once/
solve-many CVXPY program; this solves every prefix at once instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_X = 0      # vec lanes 0..d-1:   x (normal-equation iterate)
LANE_W = 8      # vec lanes 8..8+d-1: w (feasible ball copy — the output)
LANE_V = 16     # vec lanes 16..:     v (ball dual)
LANE_RES = 24   # vec lane 24:        residual


def _tril_index(j: int, k: int) -> int:
    return j * (j + 1) // 2 + k


def _cho_solve_rows(L, rhs, d):
    """(LL^T)^{-1} rhs with L given as packed (rows, 1) tiles — diagonal
    entries pre-INVERTED so the substitutions are multiply-only."""
    a = []
    for j in range(d):
        sj = rhs[j]
        for k in range(j):
            sj = sj - L[_tril_index(j, k)] * a[k]
        a.append(sj * L[_tril_index(j, j)])
    x = [None] * d
    for j in reversed(range(d)):
        sj = a[j]
        for k in range(j + 1, d):
            sj = sj - L[_tril_index(k, j)] * x[k]
        x[j] = sj * L[_tril_index(j, j)]
    return x


def _admm_kernel(lens_ref, L_ref, zy_ref, zm_ref, s_ref, u_ref, vec_ref,
                 s_out, u_out, vec_out, *, d: int, iters: int,
                 check_every: int, tol: float, kappa: float, alpha: float):
    bp, tp = s_ref.shape
    tidx = jax.lax.broadcasted_iota(jnp.int32, (bp, tp), 1)
    mask = (tidx < lens_ref[:, 0:1]).astype(jnp.float32)          # (bp, tp)
    del zm_ref  # MXU dots measured SLOWER here and bf16-truncate inputs
    # (preferred_element_type only sets the accumulator): residual stalls
    # at ~8e-2.  VPU broadcast-FMA/rowsum forms are exact f32 and faster.
    zj = [zy_ref[0, j, :].reshape(1, tp) for j in range(d)]
    yv = zy_ref[0, 8, :].reshape(1, tp)
    L = [L_ref[:, k:k + 1] for k in range(d * (d + 1) // 2)]      # (bp, 1)

    def q_of(x):
        q = x[0] * zj[0]
        for j in range(1, d):
            q = q + x[j] * zj[j]
        return q                                                   # (bp, tp)

    def one_iter(state):
        s, u, x, w, v = state
        ysu = mask * (yv + s - u)
        rhs = [jnp.sum(ysu * zj[j], axis=1, keepdims=True) + (w[j] - v[j])
               for j in range(d)]
        x = _cho_solve_rows(L, rhs, d)
        r = mask * (q_of(x) - yv)
        r_hat = alpha * r + (1.0 - alpha) * s
        sp = r_hat + u
        s = jnp.sign(sp) * jnp.maximum(jnp.abs(sp) - kappa, 0.0) * mask
        u = (u + r_hat - s) * mask
        xh = [alpha * x[j] + (1.0 - alpha) * w[j] for j in range(d)]
        t = [xh[j] + v[j] for j in range(d)]
        n2 = t[0] * t[0]
        for j in range(1, d):
            n2 = n2 + t[j] * t[j]
        # Exact sqrt + divide, NOT rsqrt: TPU rsqrt is approximate and the
        # ~1e-6 projection bias shifts the ADMM fixed point enough to
        # break active-set identification in the host polish (observed:
        # polished objectives 1e-6 above the XLA path's).
        nrm = jnp.sqrt(jnp.maximum(n2, 1.0))       # project iff ||t|| > 1
        w = [t[j] / nrm for j in range(d)]
        v = [v[j] + xh[j] - w[j] for j in range(d)]
        return (s, u, x, w, v)

    def residual(state):
        s, u, x, w, v = state
        r = mask * (q_of(x) - yv)
        pri = jnp.max(jnp.abs(r - s), axis=1, keepdims=True)      # (bp, 1)
        cons = jnp.abs(x[0] - w[0])
        for j in range(1, d):
            cons = jnp.maximum(cons, jnp.abs(x[j] - w[j]))
        return jnp.maximum(pri, cons)

    s0 = s_ref[:]
    u0 = u_ref[:]
    x0 = [vec_ref[:, LANE_X + j:LANE_X + j + 1] for j in range(d)]
    w0 = [vec_ref[:, LANE_W + j:LANE_W + j + 1] for j in range(d)]
    v0 = [vec_ref[:, LANE_V + j:LANE_V + j + 1] for j in range(d)]
    state0 = (s0, u0, x0, w0, v0)

    n_blocks = -(-iters // check_every)

    def cond(c):
        blk, worst, _ = c
        return jnp.logical_and(blk < n_blocks, worst > tol)

    def body(c):
        blk, _, state = c
        state = jax.lax.fori_loop(
            0, check_every, lambda k, st: one_iter(st), state)
        return blk + 1, jnp.max(residual(state)), state

    if tol > 0.0:
        _, _, state = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.float32(jnp.inf), state0))
    else:
        state = jax.lax.fori_loop(
            0, iters, lambda k, st: one_iter(st), state0)
    s, u, x, w, v = state
    resv = residual(state)

    s_out[:] = s
    u_out[:] = u
    lane = jax.lax.broadcasted_iota(jnp.int32, (bp, 128), 1)
    out = jnp.where(lane == LANE_RES, resv, 0.0)
    for j in range(d):
        out = out + jnp.where(lane == LANE_X + j, x[j], 0.0) \
                  + jnp.where(lane == LANE_W + j, w[j], 0.0) \
                  + jnp.where(lane == LANE_V + j, v[j], 0.0)
    vec_out[:] = out


@functools.partial(jax.jit, static_argnames=(
    "iters", "tol", "check_every", "rho", "alpha", "block_rows",
    "interpret"))
def admm_all_prefixes_l2(z, y, *, iters: int = 2000, tol: float = 2e-4,
                         check_every: int = 100, rho: float = 1.0,
                         alpha: float = 1.7, state0=None,
                         block_rows: int = 256, interpret: bool = False):
    """All-prefix exact-FTL ADMM (l2 ball) for a batch of replicates.

    Args:
      z: (B, T, d) float32; y: (B, T) float32.
      state0: opaque state from a previous call (warm continuation).
    Returns:
      (X, res, state): X (B, T, d) the feasible prefix minimizers
      (X[b, p-1] solves the length-p prefix of replicate b), res (B, T)
      residuals, state for continuation.
    """
    B, T, d = z.shape
    tp = -(-T // 128) * 128
    bp = min(block_rows, tp)
    assert tp % bp == 0, (tp, bp)
    bpr = tp // bp                       # row blocks per replicate
    nrows = B * tp
    f32 = jnp.float32
    z = z.astype(f32)
    y = y.astype(f32)

    # Per-row prefix lengths: row (b, p) solves the length-(p+1) prefix;
    # pad rows (p >= T) get length 0 and converge to the zero state.
    plens = jnp.where(jnp.arange(tp) < T, jnp.arange(tp) + 1, 0)
    lens = jnp.tile(plens.astype(jnp.int32), (B,))[:, None]       # (nrows, 1)

    # Cholesky factors of (Gram_p + I), diagonal inverted, packed tril.
    outers = z[:, :, None, :] * z[:, :, :, None]                  # (B, T, d, d)
    gram = jnp.cumsum(outers, axis=1)
    A = gram + jnp.eye(d, dtype=f32)
    chol = jnp.linalg.cholesky(A)                                 # (B, T, d, d)
    if tp != T:
        eye = jnp.broadcast_to(jnp.eye(d, dtype=f32), (B, tp - T, d, d))
        chol = jnp.concatenate([chol, eye], axis=1)
    ntri = d * (d + 1) // 2
    cols = []
    for j in range(d):
        for k in range(j + 1):
            e = chol[:, :, j, k]
            if j == k:
                e = 1.0 / e
            cols.append(e)
    Lpk = jnp.stack(cols, axis=-1).reshape(nrows, ntri)           # (nrows, ntri)
    Lpk = jnp.pad(Lpk, ((0, 0), (0, 128 - ntri)))

    # z^T rows 0..d-1 and y at row 8, padded to tp columns; zm is the
    # (tp, 8) right-operand layout for the in-kernel MXU dots.
    zt = jnp.swapaxes(z, 1, 2)                                    # (B, d, T)
    zy = jnp.zeros((B, 16, tp), f32)
    zy = zy.at[:, :d, :T].set(zt).at[:, 8, :T].set(y)
    zm = jnp.zeros((B, tp, 8), f32).at[:, :T, :d].set(z)

    if state0 is None:
        s0 = jnp.zeros((nrows, tp), f32)
        u0 = jnp.zeros((nrows, tp), f32)
        vec0 = jnp.zeros((nrows, 128), f32)
    else:
        s0, u0, vec0 = state0

    kernel = functools.partial(_admm_kernel, d=d, iters=iters,
                               check_every=check_every, tol=tol,
                               kappa=0.5 / rho, alpha=alpha)
    grid = (nrows // bp,)
    row_spec_T = pl.BlockSpec((bp, tp), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    row_spec_v = pl.BlockSpec((bp, 128), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    rep_spec = pl.BlockSpec((1, 16, tp), lambda i, _bpr=bpr: (i // _bpr, 0, 0),
                            memory_space=pltpu.VMEM)
    zm_spec = pl.BlockSpec((1, tp, 8), lambda i, _bpr=bpr: (i // _bpr, 0, 0),
                           memory_space=pltpu.VMEM)
    s1, u1, vec1 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bp, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            row_spec_v,
            rep_spec,
            zm_spec,
            row_spec_T,
            row_spec_T,
            row_spec_v,
        ],
        out_specs=[row_spec_T, row_spec_T, row_spec_v],
        out_shape=[
            jax.ShapeDtypeStruct((nrows, tp), f32),
            jax.ShapeDtypeStruct((nrows, tp), f32),
            jax.ShapeDtypeStruct((nrows, 128), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(lens, Lpk, zy, zm, s0, u0, vec0)

    vecs = vec1.reshape(B, tp, 128)
    X = vecs[:, :T, LANE_W:LANE_W + d]
    res = vecs[:, :T, LANE_RES]
    return X, res, (s1, u1, vec1)
