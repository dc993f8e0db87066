"""Fused Pallas TPU kernel for the batched FTL/FTRL online game.

The reference's hot loop (fast_algorithms.py:88-115) does, per timestep:
action -> predict -> loss -> subgradient -> accumulator update.  The XLA
``lax.scan`` path (models/linear.py) already fuses one step, but each scan
iteration still round-trips the carry through HBM and re-reads ``z_t``.
This kernel keeps EVERYTHING resident in VMEM for a whole (T, lane-batch)
tile: ``z`` is streamed in once per tile by the pipeline, and the entire
T-step game plus the comparator replay run on-chip, so per-step HBM traffic
is zero and throughput is VPU-bound.

Layout (chosen for the 8x128 VPU):
  - lanes   (last axis, 128) carry 128 independent sequences;
  - sublanes (second-to-last, 8) carry the feature dimension (d <= 8,
    zero-padded — the reference's experiments use d = 5);
  - the grid walks lane-batches; T stays whole inside the kernel.

State per tile: theta (8, 128) and cum_loss (1, 128) in VMEM scratch.
A second in-VMEM pass replays the final FTL comparator action over the tile
(fast_algorithms.py:113-115) so the kernel returns finished regrets.

This is the throughput path (f32): it is numerically faithful but does not
chase the reference's exact f64 ulp behavior — parity runs use the x64 scan
path (see ops/actions._sqrt_exact for why those differ by design).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8


def _game_kernel(eta_ref, z_ref, y_ref, out_ref, theta_ref, cum_ref, *,
                 T: int, alg_flag: int):
    """One lane-batch tile: play T rounds, then replay the comparator.

    Refs: eta (1,1) SMEM; z (T, 8, 128) VMEM; y (T, 128) VMEM;
    out (1, 128) regret; scratch theta (8, 128), cum (1, 128).
    """
    eta0 = eta_ref[0, 0]
    theta_ref[:] = jnp.zeros_like(theta_ref)
    cum_ref[:] = jnp.zeros_like(cum_ref)

    def play(t, _):
        theta = theta_ref[:]
        z_t = z_ref[t]                      # (8, 128)
        y_t = y_ref[t].reshape(1, LANES)    # (1, 128)

        if alg_flag == 0:
            # FTRL: scale then clip to the unit ball.
            t_f = jnp.maximum(1.0, (t + 1).astype(jnp.float32))
            x = (-eta0 * jax.lax.rsqrt(t_f)) * theta
            nsq = jnp.sum(x * x, axis=0, keepdims=True)
            factor = jnp.where(nsq > 1.0, jax.lax.rsqrt(jnp.maximum(nsq, 1e-30)), 1.0)
            x = x * factor
        else:
            # FTL: normalize (zero-safe).
            nsq = jnp.sum(theta * theta, axis=0, keepdims=True)
            scale = jnp.where(nsq > 0.0, -jax.lax.rsqrt(jnp.maximum(nsq, 1e-30)), 0.0)
            x = scale * theta

        q = jnp.sum(z_t * x, axis=0, keepdims=True)      # (1, 128)
        diff = q - y_t
        cum_ref[:] = cum_ref[:] + 0.5 * jnp.abs(diff)
        g = 0.5 * jnp.sign(diff)
        theta_ref[:] = theta + g * z_t
        return 0

    jax.lax.fori_loop(0, T, play, 0)

    # Comparator: final FTL action, replayed over the tile in VMEM.
    theta = theta_ref[:]
    nsq = jnp.sum(theta * theta, axis=0, keepdims=True)
    scale = jnp.where(nsq > 0.0, -jax.lax.rsqrt(jnp.maximum(nsq, 1e-30)), 0.0)
    x_c = scale * theta

    def replay(t, comp):
        q = jnp.sum(z_ref[t] * x_c, axis=0, keepdims=True)
        return comp + 0.5 * jnp.abs(q - y_ref[t].reshape(1, LANES))

    comp = jax.lax.fori_loop(0, T, replay, jnp.zeros((1, LANES), jnp.float32))
    out_ref[:] = cum_ref[:] - comp


@functools.partial(jax.jit, static_argnames=("alg_flag", "interpret"))
def play_game_tiles(z_tiles: jnp.ndarray, y_tiles: jnp.ndarray, eta0,
                    *, alg_flag: int = 0, interpret: bool = False) -> jnp.ndarray:
    """Run the online game on pre-tiled inputs (the zero-copy fast path).

    Args:
      z_tiles: ``(T, SUBLANES, B)`` f32 with the feature dim zero-padded to
        8 sublanes and ``B`` a multiple of 128.
      y_tiles: ``(T, B)`` f32 labels.
      eta0: scalar FTRL step-size scale.
      alg_flag: 0 = FTRL, 1 = FTL (compile-time).

    Returns: ``(B,)`` regrets.
    """
    T, S, B = z_tiles.shape
    assert S == SUBLANES and B % LANES == 0, (S, B)
    nb = B // LANES
    eta_arr = jnp.full((1, 1), eta0, dtype=jnp.float32)

    kernel = functools.partial(_game_kernel, T=T, alg_flag=alg_flag)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((T, SUBLANES, LANES), lambda i: (0, 0, i)),
            pl.BlockSpec((T, LANES), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((1, LANES), lambda i: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((SUBLANES, LANES), jnp.float32),
            pltpu.VMEM((1, LANES), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        interpret=interpret,
    )(eta_arr, z_tiles, y_tiles)
    return out[0]


def tile_sequences(z: jnp.ndarray, y: jnp.ndarray):
    """Rearrange ``(B, T, d)`` / ``(B, T)`` into the kernel's tile layout."""
    B, T, d = z.shape
    assert d <= SUBLANES
    pad_b = (-B) % LANES
    z = jnp.pad(z.astype(jnp.float32), ((0, pad_b), (0, 0), (0, SUBLANES - d)))
    y = jnp.pad(y.astype(jnp.float32), ((0, pad_b), (0, 0)))
    z_tiles = jnp.transpose(z, (1, 2, 0))  # (T, 8, B)
    y_tiles = jnp.transpose(y, (1, 0))     # (T, B)
    return z_tiles, y_tiles, B


def simulate_linear_pallas(z: jnp.ndarray, y: jnp.ndarray, alg_flag: int,
                           eta0, *, interpret: bool = False) -> jnp.ndarray:
    """Drop-in batched regret evaluation via the fused kernel.

    Accepts the same ``(B, T, d)`` layout as models.linear; pays one
    transpose to reach the tile layout (benchmarks should pre-tile).
    """
    z_tiles, y_tiles, B = tile_sequences(jnp.asarray(z), jnp.asarray(y))
    out = play_game_tiles(z_tiles, y_tiles, eta0, alg_flag=alg_flag,
                          interpret=interpret)
    return out[:B]
