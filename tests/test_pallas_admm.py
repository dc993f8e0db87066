"""Pallas all-prefix ADMM (VMEM-resident exact-FTL solve) vs the XLA
formulation: same math, same state contract.  Interpret mode on CPU;
the on-chip twin lives at the end (TPU-gated)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from online_convex_optimization_tpu.models.exact_ftl import _admm_all_prefixes
from online_convex_optimization_tpu.ops.pallas_admm import admm_all_prefixes_l2


def _batch(B, T, d=5, seed=0, noise=0.3):
    zs, ys = [], []
    for b in range(B):
        r = np.random.default_rng(seed + b)
        z = r.normal(size=(T, d))
        z /= np.maximum(1.0, np.linalg.norm(z, axis=1, keepdims=True))
        u = r.normal(size=d)
        u /= np.linalg.norm(u)
        zs.append(z.astype(np.float32))
        ys.append(np.sign(z @ u + noise * r.normal(size=T)).astype(np.float32))
    return jnp.asarray(np.stack(zs)), jnp.asarray(np.stack(ys))


def test_kernel_matches_xla_fixed_iterations():
    z, y = _batch(2, 70)
    Xk, rk, _ = admm_all_prefixes_l2(z, y, iters=300, tol=0.0,
                                     interpret=True)
    for b in range(2):
        Xx, rx, _ = _admm_all_prefixes(z[b], y[b], norm="l2", iters=300,
                                       tol=0.0)
        np.testing.assert_allclose(np.asarray(Xk[b]), np.asarray(Xx),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(rk[b]), np.asarray(rx),
                                   atol=1e-5)


def test_kernel_state_continuation_equals_longer_run():
    z, y = _batch(1, 40, seed=3)
    _, _, st = admm_all_prefixes_l2(z, y, iters=100, tol=0.0,
                                    interpret=True)
    Xc, rc, _ = admm_all_prefixes_l2(z, y, iters=150, tol=0.0, state0=st,
                                     interpret=True)
    Xl, rl, _ = admm_all_prefixes_l2(z, y, iters=250, tol=0.0,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(Xc), np.asarray(Xl))
    np.testing.assert_array_equal(np.asarray(rc), np.asarray(rl))


def test_kernel_padded_horizon_rows_are_inert():
    """T not a multiple of 128: pad rows get length 0 and stay zero; real
    rows match the unpadded XLA solve."""
    z, y = _batch(1, 70, seed=5)
    Xk, rk, state = admm_all_prefixes_l2(z, y, iters=200, tol=0.0,
                                         interpret=True)
    assert Xk.shape == (1, 70, 5)
    s1, u1, vec1 = state
    # rows 70..127 of the padded block: zero state, zero residual
    vecs = np.asarray(vec1).reshape(1, 128, 128)
    np.testing.assert_array_equal(vecs[0, 70:], 0.0)


@pytest.mark.requires_tpu
def test_kernel_polished_accuracy_on_chip():
    """On chip, kernel solves + host polish reach the same 1e-8 accuracy
    bar as the XLA path (cross-checked via the polished objective)."""
    from online_convex_optimization_tpu.models.polish import (
        objective,
        polish_prefix_actions,
    )

    z, y = _batch(2, 150, seed=7)
    Xk, rk, _ = admm_all_prefixes_l2(z, y, iters=6000, tol=2e-4)
    assert float(np.asarray(rk).max()) <= 1e-3
    for b in range(2):
        zb = np.asarray(z[b], np.float64)
        yb = np.asarray(y[b], np.float64)
        acts = np.concatenate([np.zeros((1, 5)),
                               np.asarray(Xk[b], np.float64)])
        acts = polish_prefix_actions(zb, yb, acts, "l2")
        Xx, _, _ = _admm_all_prefixes(z[b], y[b], norm="l2", iters=6000,
                                      tol=2e-4)
        acts_x = np.concatenate([np.zeros((1, 5)),
                                 np.asarray(Xx, np.float64)])
        acts_x = polish_prefix_actions(zb, yb, acts_x, "l2")
        for p in range(10, 151, 20):
            fk = objective(zb[:p], yb[:p], acts[p])
            fx = objective(zb[:p], yb[:p], acts_x[p])
            # Cross-path bar = the measured degenerate-valley envelope:
            # some random-l2 prefixes have two faces ~3e-3 apart in x
            # with objectives ~2.4e-6 apart; each path (and SLSQP) can
            # land on either end, so polished objectives agree only to
            # ~3e-6 there.  The absolute 1e-8 bars vs HiGHS/SLSQP live
            # in test_exact_ftl.py (non-degenerate instances).
            assert fk <= fx + 3e-6, (b, p)


def test_evaluate_exact_kernel_solver_matches_xla():
    """evaluate_stream_exact(solver='kernel') == solver='xla' after the
    polish (both reach the exact optimum; stats agree to polish noise)."""
    from online_convex_optimization_tpu.data.sequences import CASES
    from online_convex_optimization_tpu.experiments.evaluate import (
        evaluate_stream_exact)

    builder = dict(CASES)["Random i.i.d. (separable)"]
    kw = dict(T_grid=[30, 50], runs=2, replicates=2, iters=1200,
              dtype=np.float32, stream_name="k", progress=False)
    s_k = evaluate_stream_exact(builder, solver="kernel", **kw)
    s_x = evaluate_stream_exact(builder, solver="xla", **kw)
    for key in s_x:
        np.testing.assert_allclose(s_k[key][0], s_x[key][0], atol=1e-5)
        np.testing.assert_allclose(s_k[key][1], s_x[key][1], atol=1e-5)
