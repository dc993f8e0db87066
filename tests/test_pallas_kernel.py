"""Pallas fused game kernel: interpret-mode check on CPU + TPU-gated test.

The kernel is the f32 throughput path; agreement with the f32 XLA scan is
expected to ~1e-4 (rsqrt vs division, reduction order), not the 1e-6 f64
parity bar (that is the scan path's job).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from online_convex_optimization_tpu.models.linear import simulate_linear_batch
from online_convex_optimization_tpu.ops.pallas_step import (
    simulate_linear_pallas,
    tile_sequences,
)


def _batch(B=64, T=96, seed=0):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(B, T, 5)).astype(np.float32)
    z /= np.maximum(1.0, np.linalg.norm(z, axis=-1, keepdims=True))
    y = np.where(rng.random((B, T)) < 0.5, -1.0, 1.0).astype(np.float32)
    return z, y


def test_tile_layout_roundtrip():
    z, y = _batch(B=5, T=7)
    z_t, y_t, B = tile_sequences(jnp.asarray(z), jnp.asarray(y))
    assert z_t.shape == (7, 8, 128) and y_t.shape == (7, 128) and B == 5
    np.testing.assert_array_equal(np.asarray(z_t[:, :5, :5]),
                                  z.transpose(1, 2, 0))
    np.testing.assert_array_equal(np.asarray(z_t[:, 5:, :]), 0.0)


@pytest.mark.parametrize("alg_flag", [0, 1])
def test_kernel_interpret_matches_scan(alg_flag):
    z, y = _batch()
    reg_k = np.asarray(simulate_linear_pallas(z, y, alg_flag, 1.2,
                                              interpret=True))
    res = simulate_linear_batch(jnp.asarray(z), jnp.asarray(y), alg_flag, 1.2)
    reg_s = np.asarray(res.regret, dtype=np.float32)
    np.testing.assert_allclose(reg_k, reg_s, atol=5e-4)


@pytest.mark.requires_tpu
@pytest.mark.parametrize("alg_flag", [0, 1])
def test_kernel_tpu_matches_scan(alg_flag):
    z, y = _batch(B=256, T=256)
    reg_k = np.asarray(simulate_linear_pallas(z, y, alg_flag, 1.2))
    res = simulate_linear_batch(jnp.asarray(z), jnp.asarray(y), alg_flag, 1.2)
    np.testing.assert_allclose(reg_k, np.asarray(res.regret), atol=2e-3)
