"""Hyperparameter sweep front-ends (BASELINE.json config 2: "FTRL with L2
regularization, learning-rate sweep over 64 settings via vmap").

The reference has no sweep machinery at all — eta0 and the SMART threshold
are constants (algorithms.py:123-125).  Here grids are first-class batch
axes: a sweep is ONE compiled program evaluating the (sequence x setting)
cross product, optionally sharded over a device mesh.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from online_convex_optimization_tpu.models.linear import simulate_linear_batch
from online_convex_optimization_tpu.models.smart import simulate_smart_batch


def _cross(z, y, n_grid):
    """Tile B sequences n_grid times -> (B*n_grid, ...) cross product."""
    B = z.shape[0]
    z_rep = jnp.repeat(z, n_grid, axis=0)
    y_rep = jnp.repeat(y, n_grid, axis=0)
    return z_rep, y_rep, B


def _mask_tails(z, y, length):
    """Zero out padded tails so they are inert in the packed kernels."""
    if length is None:
        return z, y
    T = z.shape[1]
    valid = jnp.arange(T)[None, :] < jnp.asarray(length)[:, None]
    return (jnp.where(valid[..., None], z, 0.0),
            jnp.where(valid, y, 0.0))


def ftrl_eta_sweep(z, y, eta_grid, *, alg_flag: int = 0,
                   length: Optional[np.ndarray] = None,
                   use_kernel: Union[str, bool] = "auto",
                   interpret: bool = False) -> jnp.ndarray:
    """Regret of every (sequence, eta0) pair.

    Args:
      z: (B, T, d); y: (B, T); eta_grid: (E,).
      use_kernel: True / False / "auto" (kernel on TPU).  The kernel path
        runs the sweep as a Pallas grid dimension (eta_sweep_packed) —
        ~13x the scan path's throughput at f32.
    Returns: (B, E) regrets.
    """
    z = jnp.asarray(z)
    y = jnp.asarray(y)
    if use_kernel == "auto":
        use_kernel = jax.default_backend() == "tpu" and alg_flag == 0
    if use_kernel:
        from online_convex_optimization_tpu.ops.pallas_game import (
            LANES, eta_sweep_packed, pack_sequences)
        assert alg_flag == 0, "kernel sweep path is FTRL-only"
        zm, ym = _mask_tails(z, y, length)
        z_pack, y_pack, B = pack_sequences(zm, ym)
        reg = eta_sweep_packed(z_pack, y_pack,
                               jnp.asarray(eta_grid, jnp.float32),
                               interpret=interpret)           # (E, S, Bp)
        # Vectorized unpack (the per-e twin of unpack_result): ONE device
        # op, not E host round-trips.
        E, S, BL = reg.shape
        nb = BL // LANES
        out = (reg.reshape(E, S, nb, LANES).transpose(0, 2, 1, 3)
                  .reshape(E, nb * S * LANES)[:, :B])
        return out.T                                          # (B, E)
    eta_grid = jnp.asarray(eta_grid, z.dtype)
    E = eta_grid.shape[0]
    z_rep, y_rep, B = _cross(z, y, E)
    etas = jnp.tile(eta_grid, B)
    len_rep = None if length is None else jnp.repeat(jnp.asarray(length), E)
    res = simulate_linear_batch(z_rep, y_rep, alg_flag, etas, len_rep)
    return res.regret.reshape(B, E)


def smart_threshold_sweep(z, y, thresh_grid, *, eta0: float,
                          length: Optional[np.ndarray] = None,
                          use_kernel: Union[str, bool] = "auto",
                          interpret: bool = False) -> jnp.ndarray:
    """Regret of every (sequence, theta_thresh) pair -> (B, G).

    The kernel path (auto on TPU) runs the grid as a Pallas grid
    dimension (ops/pallas_smart.py::smart_sweep_packed): the G-point
    tuning sweep re-streams the same packed blocks — no BxG data
    duplication, unlike the scan cross product below.
    """
    z = jnp.asarray(z)
    y = jnp.asarray(y)
    if use_kernel == "auto":
        use_kernel = jax.default_backend() == "tpu"
    if use_kernel:
        from online_convex_optimization_tpu.ops.pallas_game import (
            LANES, pack_sequences)
        from online_convex_optimization_tpu.ops.pallas_smart import (
            smart_sweep_packed)
        zm, ym = _mask_tails(z, y, length)
        z_pack, y_pack, B = pack_sequences(zm, ym)
        reg, _ = smart_sweep_packed(z_pack, y_pack,
                                    jnp.asarray(thresh_grid, jnp.float32),
                                    float(eta0), interpret=interpret)
        G, S, BL = reg.shape
        nb = BL // LANES
        out = (reg.reshape(G, S, nb, LANES).transpose(0, 2, 1, 3)
                  .reshape(G, nb * S * LANES)[:, :B])
        return out.T                                          # (B, G)
    thresh_grid = jnp.asarray(thresh_grid, z.dtype)
    G = thresh_grid.shape[0]
    z_rep, y_rep, B = _cross(z, y, G)
    ths = jnp.tile(thresh_grid, B)
    etas = jnp.full((B * G,), eta0, z.dtype)
    len_rep = None if length is None else jnp.repeat(jnp.asarray(length), G)
    res = simulate_smart_batch(z_rep, y_rep, ths, etas, len_rep)
    return res.regret.reshape(B, G)
