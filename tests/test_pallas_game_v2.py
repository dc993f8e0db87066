"""v2 packed game kernel: layout round-trip + interpret-mode agreement."""

import numpy as np
import pytest

import jax.numpy as jnp

from online_convex_optimization_tpu.models.linear import simulate_linear_batch
from online_convex_optimization_tpu.ops.pallas_game import (
    SEQ_TILE,
    ftrl_scales,
    pack_sequences,
    simulate_linear_pallas_v2,
    unpack_result,
)


def _batch(B=SEQ_TILE, T=64, seed=0):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(B, T, 5)).astype(np.float32)
    z /= np.maximum(1.0, np.linalg.norm(z, axis=-1, keepdims=True))
    y = np.where(rng.random((B, T)) < 0.5, -1.0, 1.0).astype(np.float32)
    return z, y


def test_pack_unpack_roundtrip():
    z, y = _batch(B=100, T=16)
    z_pack, y_pack, B = pack_sequences(jnp.asarray(z), jnp.asarray(y))
    assert z_pack.shape == (16, 5, 8, 128) and B == 100
    # Pick a sequence, verify its packed slice, then unpack identity.
    flat = np.arange(SEQ_TILE, dtype=np.float32)
    rec = unpack_result(jnp.asarray(flat.reshape(1, SEQ_TILE)
                                    .reshape(8, 128, order="C")), SEQ_TILE)
    # unpack maps (s, nb, l) -> b; with nb=1 this is s*128 + l = identity.
    np.testing.assert_array_equal(np.asarray(rec), flat)
    # Data round-trip through pack: z_pack[t, j, s, l] == z[b, t, j].
    zp = np.asarray(z_pack)
    for b in (0, 57, 99):
        s, l = divmod(b, 128)
        np.testing.assert_array_equal(zp[:, :, s, l], z[b])
    # Padding rows are zero (inert in the game).
    s, l = divmod(100, 128)
    np.testing.assert_array_equal(zp[:, :, s, l], 0.0)


def test_ftrl_scales_values():
    sc = np.asarray(ftrl_scales(4, 2.0))
    np.testing.assert_allclose(
        sc, -(2.0 / np.sqrt(np.array([1., 2., 3., 4.], np.float32))),
        rtol=1e-7)


def test_v2_lane_fallback_nb5():
    """Packed lane dims that are multiples of 128 but not 512 must work
    (lanes_per_program is reduced to a divisor)."""
    z, y = _batch(B=5 * SEQ_TILE, T=16, seed=9)
    got = np.asarray(simulate_linear_pallas_v2(z, y, 0, 1.0, interpret=True))
    want = np.asarray(simulate_linear_batch(jnp.asarray(z), jnp.asarray(y),
                                            0, 1.0).regret, dtype=np.float32)
    np.testing.assert_allclose(got, want, atol=5e-4)


@pytest.mark.parametrize("alg_flag", [0, 1])
def test_v2_interpret_matches_scan(alg_flag):
    z, y = _batch(B=SEQ_TILE, T=32)
    got = np.asarray(simulate_linear_pallas_v2(z, y, alg_flag, 1.3,
                                               interpret=True))
    want = np.asarray(
        simulate_linear_batch(jnp.asarray(z), jnp.asarray(y), alg_flag,
                              1.3).regret, dtype=np.float32)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_v2_zero_padded_tail_is_inert():
    """Heterogeneous horizons via zero rows: padded steps add no loss."""
    z, y = _batch(B=SEQ_TILE, T=48)
    z_cut = z.copy()
    y_cut = y.copy()
    z_cut[:, 32:] = 0.0
    y_cut[:, 32:] = 0.0
    got = np.asarray(simulate_linear_pallas_v2(z_cut, y_cut, 0, 1.0,
                                               interpret=True))
    want = np.asarray(simulate_linear_pallas_v2(z[:, :32], y[:, :32], 0, 1.0,
                                                interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_eta_sweep_kernel_interpret_matches_scan_sweep():
    from online_convex_optimization_tpu.models.sweep_api import ftrl_eta_sweep
    from online_convex_optimization_tpu.ops.pallas_game import eta_sweep_packed

    z, y = _batch(B=SEQ_TILE, T=32, seed=4)
    grid = np.linspace(0.2, 2.5, 3).astype(np.float32)
    z_pack, y_pack, B = pack_sequences(jnp.asarray(z), jnp.asarray(y))
    out = np.asarray(eta_sweep_packed(z_pack, y_pack, jnp.asarray(grid),
                                      interpret=True))
    want = np.asarray(ftrl_eta_sweep(z, y, grid))  # (B, E)
    for e in range(3):
        got_e = np.asarray(unpack_result(jnp.asarray(out[e]), B))
        np.testing.assert_allclose(got_e, want[:, e], atol=5e-4)


@pytest.mark.requires_tpu
@pytest.mark.parametrize("alg_flag", [0, 1])
def test_v2_tpu_matches_scan(alg_flag):
    z, y = _batch(B=2 * SEQ_TILE, T=256)
    got = np.asarray(simulate_linear_pallas_v2(z, y, alg_flag, 1.25))
    want = np.asarray(
        simulate_linear_batch(jnp.asarray(z), jnp.asarray(y), alg_flag,
                              1.25).regret)
    np.testing.assert_allclose(got, want, atol=2e-3)
