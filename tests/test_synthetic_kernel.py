"""Generation-fused game kernel (in-kernel PRNG): determinism and
distributional agreement with the scan path (TPU; interpret mode on CPU
exercises compilation only)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from online_convex_optimization_tpu.models.linear import simulate_linear_batch
from online_convex_optimization_tpu.ops.pallas_game import synthetic_regrets


@pytest.mark.requires_tpu
def test_synthetic_is_deterministic():
    # Interpret mode can't emulate the TPU PRNG primitives on CPU
    # (prng_seed has no CPU lowering), so this runs on chip only.
    a = np.asarray(synthetic_regrets(3, 1.0, T=32, lane_batch=128))
    b = np.asarray(synthetic_regrets(3, 1.0, T=32, lane_batch=128))
    c = np.asarray(synthetic_regrets(4, 1.0, T=32, lane_batch=128))
    assert a.shape == (8, 128)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert np.all(np.isfinite(a))


@pytest.mark.requires_tpu
def test_synthetic_matches_scan_distribution():
    """Mean/std of FTRL regret on Rademacher data must agree between the
    in-kernel PRNG stream and jax.random + scan (different bitstreams,
    same distribution)."""
    T, LB = 300, 512
    syn = np.asarray(synthetic_regrets(7, np.sqrt(2.0),
                                       T=T, lane_batch=LB))
    key = jax.random.key(0)
    kz, ky = jax.random.split(key)
    B = 4096
    z = jax.random.rademacher(kz, (B, T, 5), jnp.float32) / np.sqrt(5.0)
    y = jax.random.rademacher(ky, (B, T), jnp.float32)
    ref = np.asarray(simulate_linear_batch(z, y, 0, np.sqrt(2.0)).regret)
    assert syn.mean() == pytest.approx(ref.mean(), abs=4 * ref.std() / np.sqrt(B))
    assert syn.std() == pytest.approx(ref.std(), rel=0.15)


@pytest.mark.requires_tpu
def test_synthetic_single_launch_T_2pow20():
    """Nothing in the launch scales with T (in-kernel round-index scales):
    T = 2^20 runs as ONE kernel launch at fixed VMEM."""
    out = np.asarray(synthetic_regrets(11, np.sqrt(2.0), T=1 << 20,
                                       lane_batch=128))
    assert out.shape == (8, 128)
    assert np.all(np.isfinite(out))
    # Regret of FTRL on Rademacher data concentrates near Theta(sqrt(T)).
    assert 0.0 < out.mean() < 10.0 * np.sqrt(float(1 << 20))
