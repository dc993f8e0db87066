"""Fused single-pass SMART kernel: the whole algorithm in O(T d) per lane.

Reference semantics (/root/reference/fast_algorithms.py:118-164): an
always-on FTL track, a pre-switch threshold test against the FTL lead over
the prefix comparator, and a fresh-at-switch FTRL track with global round
index.  The reference's pre-switch test recomputes the prefix comparator
loss from scratch every round — O(T² d) sequential scalar work
(fast_algorithms.py:157-158).

This kernel runs the ENTIRE algorithm — both tracks, the switch test, and
the final comparator — in ONE streaming pass over (z, y) at O(T d), using
the hinge identity (models/smart.py module docstring): with ||z_t|| <= 1
(the framework's data builders clip every row), y in {-1, 0(pad), +1}, and
every action in the unit L2 ball,

    0.5 * sum_{i<=t} |<s, z_i> - y_i|  ==  0.5 * (cnt_t - <s, w_t>),
    w_t = sum_{i<=t} y_i z_i,   cnt_t = sum_{i<=t} y_i^2,

so the prefix comparator loss of ANY candidate action is an O(d) dot
product against carried statistics — including the final comparator, which
therefore needs no replay pass.

Layout and state conventions follow ops/pallas_game.py: (sublane, lane)
tiles carry independent sequences; the feature dimension unrolls into
registers; theta accumulators are doubled (theta2 = 2*theta, bit-exact)
so subgradient updates add sign(diff)*z with no 0.5 multiply; losses
accumulate un-halved.  Per-lane threshold and eta tiles make (threshold x
eta) hyperparameter grids ride the sequence axis at full speed.

The switch is pure dataflow: ``a`` (active-FTRL) is a 0/1 mask set the
round AFTER the threshold test first passes, matching the reference's
"switch starting next round" semantics; no control flow, no phases.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from online_convex_optimization_tpu.ops.pallas_game import (
    LANES,
    _choose_tiles,
    _ftl_eff,
    sublanes_for,
)


def _smart_round(z_t, y_t, sh, s2v, th2, state):
    """One SMART round on a lane tile (shared by the per-lane-grid kernel
    and the threshold-sweep kernel; see _smart_kernel for the dataflow).

    sh / s2v: this round's FTRL constants with eta already folded in
    (sh = -eta/(2*sqrt(t)), s2v = eta^2/(4*max(1,t))); th2 = 2*threshold
    (tile or scalar).  state = (th, w, thr, cnt, F, total, a, na, nth).
    """
    th, w, thr, cnt, F, total, a, na, nth = state
    d = len(th)

    # --- FTL track: play pre-update action, update theta2 ---
    dotF = z_t[0] * th[0]
    for j in range(1, d):
        dotF = dotF + z_t[j] * th[j]
    effF = _ftl_eff(nth)                    # pre-update ||theta2||^2
    diffF = effF * dotF - y_t
    sF = jnp.sign(diffF)
    lossF = diffF * sF                      # == |q - y| (un-halved)
    F = F + lossF
    th = [th[j] + sF * z_t[j] for j in range(d)]

    # --- identity statistics ---
    w = [w[j] + y_t * z_t[j] for j in range(d)]
    cnt = cnt + y_t * y_t

    # --- switch test on the POST-update action s_t ---
    # Post-update norm recomputed directly (cheaper than incremental
    # for every d; rounding matches the scan's direct norms).
    nth = th[0] * th[0]
    dotw = th[0] * w[0]
    for j in range(1, d):
        nth = nth + th[j] * th[j]
        dotw = dotw + th[j] * w[j]
    effP = _ftl_eff(nth)
    lead2 = F - cnt + effP * dotw           # == 2 * (ftl_loss - s_loss)
    hit = (1.0 - a) * (lead2 >= th2).astype(jnp.float32)
    na = na + (1.0 - a)                     # pre-switch round counter

    # --- FTRL track, gated on a (switched in an EARLIER round) ---
    dotR = z_t[0] * thr[0]
    nthR = thr[0] * thr[0]
    for j in range(1, d):
        dotR = dotR + z_t[j] * thr[j]
        nthR = nthR + thr[j] * thr[j]
    clip = jax.lax.rsqrt(jnp.maximum(s2v * nthR, 1.0))
    diffR = (sh * clip) * dotR - y_t
    sR = jnp.sign(diffR)
    total = total + lossF + a * (diffR * sR - lossF)
    gR = a * sR
    thr = [thr[j] + gR * z_t[j] for j in range(d)]
    a = a + hit                              # switch applies NEXT round
    return th, w, thr, cnt, F, total, a, na, nth


def _smart_kernel(scaleh_ref, s2_ref, th2_ref, eta_ref, z_ref, y_ref,
                  out_ref, tau_ref, th_acc, w_acc, thr_acc, sc_acc,
                  *, ct: int, d: int, nchunks: int, unroll: int):
    """One (lane-batch, time-chunk) grid step of the fused SMART game.

    Scalars: scaleh (T,) = -isqrt(t)/2, s2 (T,) = 1/(4*max(1,t)).
    Inputs: th2 (S, lanes) = 2*theta_thresh; eta (S, lanes);
            z (ct, d, S, lanes); y (ct, S, lanes).
    Outputs: out = regret (S, lanes); tau = switch round, T if none.
    Scratch: th_acc (d,S,l) FTL theta2; w_acc (d,S,l) sum y z;
             thr_acc (d,S,l) FTRL theta2; sc_acc (6,S,l) packs
             [cnt, F(unhalved ftl loss), total(unhalved), a(0/1 switched),
              na(pre-switch round count; tau = na - a at finalize),
              nth(FTL post-update ||theta2||^2, carried across rounds)].

    Tail-op economy (the loop is VPU-issue-bound): the post-update norm
    is recomputed DIRECTLY from the fresh theta2 (d mul + (d-1) add),
    which beats the incremental nth + sF*(2*dotF + sF*||z||^2) update
    (2d-1 ops for ||z||^2 plus 5) for every d, matches the scan's
    rounding (models/smart.py computes ftl_action norms directly), and
    keeps one carried scalar; the switch round is recovered from a
    pre-switch round COUNTER (na += 1-a, two ops) instead of the masked
    round-index blend (scalar int->float convert + three vector ops).
    """
    chunk = pl.program_id(1)

    @pl.when(chunk == 0)
    def _init():
        th_acc[:] = jnp.zeros_like(th_acc)
        w_acc[:] = jnp.zeros_like(w_acc)
        thr_acc[:] = jnp.zeros_like(thr_acc)
        sc_acc[:] = jnp.zeros_like(sc_acc)

    th2 = th2_ref[:]
    eta = eta_ref[:]
    eta2 = eta * eta

    def one(k, state):
        z_t = [z_ref[k, j].astype(jnp.float32) for j in range(d)]
        y_t = y_ref[k].astype(jnp.float32)
        t_idx = chunk * ct + k
        return _smart_round(z_t, y_t, eta * scaleh_ref[t_idx],
                            eta2 * s2_ref[t_idx], th2, state)

    def body(i, state):
        for u in range(unroll):
            state = one(i * unroll + u, state)
        return state

    state0 = ([th_acc[j] for j in range(d)], [w_acc[j] for j in range(d)],
              [thr_acc[j] for j in range(d)], sc_acc[0], sc_acc[1],
              sc_acc[2], sc_acc[3], sc_acc[4], sc_acc[5])
    th, w, thr, cnt, F, total, a, na, nth = jax.lax.fori_loop(
        0, ct // unroll, lambda i, s: body(i, s), state0)
    for j in range(d):
        th_acc[j] = th[j]
        w_acc[j] = w[j]
        thr_acc[j] = thr[j]
    sc_acc[0], sc_acc[1], sc_acc[2] = cnt, F, total
    sc_acc[3], sc_acc[4], sc_acc[5] = a, na, nth

    @pl.when(chunk == nchunks - 1)
    def _finalize():
        # Comparator = final FTL action scored by the identity: no replay.
        dotw = th_acc[0] * w_acc[0]
        for j in range(1, d):
            dotw = dotw + th_acc[j] * w_acc[j]
        effC = _ftl_eff(sc_acc[5])
        comp2 = sc_acc[0] - effC * dotw          # un-halved comparator loss
        out_ref[:] = 0.5 * (sc_acc[2] - comp2)
        tau_ref[:] = sc_acc[4] - sc_acc[3]       # tau = na - a (T if never)


@functools.partial(jax.jit,
                   static_argnames=("chunk_t", "unroll", "lanes_per_program",
                                    "interpret"))
def smart_regrets_packed(z_pack, y_pack, thresh_pack, eta_pack, *,
                         chunk_t: int = 256, unroll: int = 16,
                         lanes_per_program: int = LANES,
                         interpret: bool = False):
    """Fused SMART regret evaluation on packed sequences.

    Args:
      z_pack: (T, d, S, B) f32/bf16 (rows MUST lie in the unit L2 ball —
        guaranteed by the framework's data builders); y_pack: (T, S, B)
        with values in {-1, 0 (padding), +1}.
      thresh_pack: (S, B) per-sequence switch thresholds.
      eta_pack: (S, B) per-sequence FTRL eta0.
    Returns:
      (regret (S, B) f32, switch_t (S, B) f32 — T when never switched).
    """
    T, d, S, B = z_pack.shape
    assert S == sublanes_for(z_pack.dtype), (S, z_pack.dtype)
    lanes, ct, u, nchunks, nb = _choose_tiles(
        B, T, d, lanes_per_program, chunk_t, unroll,
        sublanes=S, itemsize=z_pack.dtype.itemsize)

    t = np.arange(1, T + 1, dtype=np.float32)
    scaleh = jnp.asarray(-0.5 / np.sqrt(np.maximum(t, 1.0)))
    s2 = jnp.asarray(0.25 / np.maximum(t, 1.0))
    th2 = 2.0 * jnp.asarray(thresh_pack, jnp.float32)
    eta = jnp.asarray(eta_pack, jnp.float32)

    kernel = functools.partial(_smart_kernel, ct=ct, d=d, nchunks=nchunks,
                               unroll=u)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # scaleh, s2
        grid=(nb, nchunks),
        in_specs=[
            pl.BlockSpec((S, lanes), lambda i, j, s1, s2: (0, i)),  # th2
            pl.BlockSpec((S, lanes), lambda i, j, s1, s2: (0, i)),  # eta
            pl.BlockSpec((ct, d, S, lanes),
                         lambda i, j, s1, s2: (j, 0, 0, i)),
            pl.BlockSpec((ct, S, lanes), lambda i, j, s1, s2: (j, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((S, lanes), lambda i, j, s1, s2: (0, i)),
            pl.BlockSpec((S, lanes), lambda i, j, s1, s2: (0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, S, lanes), jnp.float32),   # FTL theta2
            pltpu.VMEM((d, S, lanes), jnp.float32),   # w = sum y z
            pltpu.VMEM((d, S, lanes), jnp.float32),   # FTRL theta2
            pltpu.VMEM((6, S, lanes), jnp.float32),   # cnt/F/total/a/tau/nth
        ],
    )
    regret, tau = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((S, B), jnp.float32),
            jax.ShapeDtypeStruct((S, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(scaleh, s2, th2, eta, z_pack, y_pack)
    return regret, tau


def _smart_sweep_kernel(scaleh_ref, s2_ref, th2_ref, z_ref, y_ref,
                        out_ref, tau_ref, th_acc, w_acc, thr_acc, sc_acc,
                        *, ct: int, d: int, nchunks: int, unroll: int):
    """Threshold-sweep SMART: grid (lane-batch, threshold-setting,
    time-chunk).  Each (i, g) pass re-streams the same z/y blocks under a
    different scalar switch threshold — a G-point tuning sweep costs no
    input duplication (the eta_sweep_packed pattern applied to SMART).
    eta is a per-launch scalar folded into scaleh/s2 by the caller;
    th2 (G,) SMEM holds 2*thresholds."""
    g = pl.program_id(1)
    chunk = pl.program_id(2)

    @pl.when(chunk == 0)
    def _init():
        th_acc[:] = jnp.zeros_like(th_acc)
        w_acc[:] = jnp.zeros_like(w_acc)
        thr_acc[:] = jnp.zeros_like(thr_acc)
        sc_acc[:] = jnp.zeros_like(sc_acc)

    th2 = th2_ref[g]

    def one(k, state):
        z_t = [z_ref[k, j].astype(jnp.float32) for j in range(d)]
        y_t = y_ref[k].astype(jnp.float32)
        t_idx = chunk * ct + k
        return _smart_round(z_t, y_t, scaleh_ref[t_idx], s2_ref[t_idx],
                            th2, state)

    def body(i, state):
        for u in range(unroll):
            state = one(i * unroll + u, state)
        return state

    state0 = ([th_acc[j] for j in range(d)], [w_acc[j] for j in range(d)],
              [thr_acc[j] for j in range(d)], sc_acc[0], sc_acc[1],
              sc_acc[2], sc_acc[3], sc_acc[4], sc_acc[5])
    th, w, thr, cnt, F, total, a, na, nth = jax.lax.fori_loop(
        0, ct // unroll, lambda i, s: body(i, s), state0)
    for j in range(d):
        th_acc[j] = th[j]
        w_acc[j] = w[j]
        thr_acc[j] = thr[j]
    sc_acc[0], sc_acc[1], sc_acc[2] = cnt, F, total
    sc_acc[3], sc_acc[4], sc_acc[5] = a, na, nth

    @pl.when(chunk == nchunks - 1)
    def _finalize():
        dotw = th_acc[0] * w_acc[0]
        for j in range(1, d):
            dotw = dotw + th_acc[j] * w_acc[j]
        effC = _ftl_eff(sc_acc[5])
        comp2 = sc_acc[0] - effC * dotw
        out_ref[0] = 0.5 * (sc_acc[2] - comp2)
        tau_ref[0] = sc_acc[4] - sc_acc[3]


@functools.partial(jax.jit,
                   static_argnames=("chunk_t", "unroll", "lanes_per_program",
                                    "interpret"))
def smart_sweep_packed(z_pack, y_pack, thresh_grid, eta0, *,
                       chunk_t: int = 256, unroll: int = 4,
                       lanes_per_program: int = LANES,
                       interpret: bool = False):
    """SMART regrets for every (sequence, threshold) pair with NO data
    duplication: thresholds are a kernel grid dimension re-streaming the
    same packed blocks (the reference tunes its switch threshold from the
    empirical g(T) table — this evaluates a whole tuning grid in one
    launch).

    Args:
      z_pack: (T, d, S, B) f32/bf16; y_pack: (T, S, B);
      thresh_grid: (G,) f32 switch thresholds; eta0: scalar FTRL step.
    Returns: (regret (G, S, B), switch_t (G, S, B) f32 — T if never).
    """
    T, d, S, B = z_pack.shape
    G = thresh_grid.shape[0]
    assert S == sublanes_for(z_pack.dtype), (S, z_pack.dtype)
    lanes, ct, u, nchunks, nb = _choose_tiles(
        B, T, d, lanes_per_program, chunk_t, unroll,
        sublanes=S, itemsize=z_pack.dtype.itemsize)

    eta = jnp.asarray(eta0, jnp.float32)
    t = np.arange(1, T + 1, dtype=np.float32)
    scaleh = (-0.5 * eta) * jnp.asarray(1.0 / np.sqrt(np.maximum(t, 1.0)))
    s2 = (0.25 * eta * eta) * jnp.asarray(1.0 / np.maximum(t, 1.0))
    th2 = 2.0 * jnp.asarray(thresh_grid, jnp.float32)

    kernel = functools.partial(_smart_sweep_kernel, ct=ct, d=d,
                               nchunks=nchunks, unroll=u)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # scaleh, s2, th2
        grid=(nb, G, nchunks),
        in_specs=[
            pl.BlockSpec((ct, d, S, lanes),
                         lambda i, g, j, s1, s2, s3: (j, 0, 0, i)),
            pl.BlockSpec((ct, S, lanes),
                         lambda i, g, j, s1, s2, s3: (j, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, S, lanes), lambda i, g, j, s1, s2, s3: (g, 0, i)),
            pl.BlockSpec((1, S, lanes), lambda i, g, j, s1, s2, s3: (g, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, S, lanes), jnp.float32),   # FTL theta2
            pltpu.VMEM((d, S, lanes), jnp.float32),   # w = sum y z
            pltpu.VMEM((d, S, lanes), jnp.float32),   # FTRL theta2
            pltpu.VMEM((6, S, lanes), jnp.float32),   # cnt/F/total/a/na/nth
        ],
    )
    regret, tau = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, S, B), jnp.float32),
            jax.ShapeDtypeStruct((G, S, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(scaleh, s2, th2, z_pack, y_pack)
    return regret, tau


def simulate_smart_pallas(z, y, theta_thresh, eta0, *, dtype=jnp.float32,
                          interpret: bool = False):
    """Drop-in batched SMART via the fused kernel ((B, T, d) API).

    ``theta_thresh`` / ``eta0``: scalars or (B,) arrays (hyperparameter
    grids ride the sequence axis).  Returns (regret (B,), switch_t (B,)
    int32 — T when never switched), matching
    ``models.smart.simulate_smart_batch`` outputs.
    """
    from online_convex_optimization_tpu.ops.pallas_game import (
        pack_per_seq, pack_sequences, unpack_result)

    z = jnp.asarray(z)
    y = jnp.asarray(y)
    B = z.shape[0]
    z_pack, y_pack, _ = pack_sequences(z, y, dtype)
    S = z_pack.shape[2]
    th = jnp.broadcast_to(jnp.asarray(theta_thresh, jnp.float32), (B,))
    et = jnp.broadcast_to(jnp.asarray(eta0, jnp.float32), (B,))
    regret, tau = smart_regrets_packed(
        z_pack, y_pack, pack_per_seq(th, S), pack_per_seq(et, S),
        interpret=interpret)
    return (unpack_result(regret, B),
            unpack_result(tau, B).astype(jnp.int32))
