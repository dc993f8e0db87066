"""Semismooth Newton (Huber continuation) exact-FTL solver, l2 ball.

The general-path alternative to the batched ADMM in models/exact_ftl.py
for data OUTSIDE the certified linear regime (models/linear_regime.py).
The ADMM's iteration count on the nonsmooth program

    minimize_{||x||_2 <= 1}  f(x) = 0.5 * sum_i m_i |<z_i, x> - y_i|

grows with T (~1.8-2.2k iterations to 2e-4 at T = 1000 — measured, see
docs/BENCHMARKS.md), and rho schedules / acceleration / MXU precision
were all measured neutral: only a different algorithm class can beat it.
This is that class:

  1. HUBER SMOOTHING with continuation: f_mu replaces |r| by
     r^2/(2 mu) for |r| <= mu.  f_mu is convex C^1 with piecewise-linear
     gradient — the canonical semismooth-Newton setting.  mu starts at
     the data scale and shrinks geometrically as soon as the smoothed
     problem is solved at the current mu.
  2. BALL-CONSTRAINED NEWTON STEP: at x, the quadratic model
     min_{||v|| <= 1} 0.5 v^T H v + b^T v  (H = Huber Hessian, exact)
     is solved by a safeguarded More-Sorensen secular iteration — the
     same solver family as the quadratic track's in-kernel trust region
     (ops/pallas_trs.py), with the same lesson applied: NEVER XLA's
     batched tiny linalg (185x slower, measured); the d x d Cholesky
     and triangular solves are d-unrolled elementwise ops.
  3. BATCHED LINE SEARCH: f_mu is evaluated on a geometric step ladder
     for every row simultaneously from ONE extra matmul (predictions are
     carried, so the trial losses are elementwise).

Every prefix problem is one row of the batch, exactly like the ADMM
(same (X, res, state) interface, same banding, same continuation
contract), so the two solvers are drop-in interchangeable and
cross-validated against each other and HiGHS/SLSQP in the tests.

Cost model: one Newton iteration is ~3 ADMM iterations (an extra
(rows, T) x (T, d^2) Hessian-stats matmul and the line-search ladder);
convergence takes ~20-60 Newton iterations where the ADMM takes
1.8-2.2k — an order of magnitude less work on hard instances.

Reference parity: this replaces the reference's per-prefix CVXPY/ECOS
interior-point solves (/root/reference/exact_ftl.py:119-128) on the
general (unclipped) data regime its own smoke test uses
(exact_ftl.py:460-475).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

# Step ladder for the batched line search (t = 1 accepted near the
# optimum where Newton is exact; small steps guard the piecewise-quadratic
# region where the model can underestimate curvature).  t = 0 keeps the
# incumbent when every trial loses (monotone descent by construction).
_LADDER = (1.0, 0.5, 0.25, 0.125, 1 / 16, 1 / 32, 1 / 64, 1 / 128,
           1 / 512, 0.0)

_MU_SHRINK = 0.125          # continuation factor per solved stage
_SECULAR_ITERS = 24         # More-Sorensen iterations per Newton step


def _chol_unrolled(A, d: int):
    """Cholesky of (..., d, d) PSD matrices as d-unrolled elementwise ops
    (XLA's batched linalg on tiny matrices is measured ~two orders slower
    on TPU).  Returns L with A = L L^T; the pivot floor is RELATIVE to
    the matrix scale so a singular H yields large-but-f32-finite solves
    (an absolute 1e-20 floor overflows f32 through n^3/||q||^2 in the
    secular update) — the secular iteration adds lambda >= 0 anyway.
    """
    eps = jnp.finfo(A.dtype).eps
    diag_max = A[..., 0, 0]
    for i in range(1, d):
        diag_max = jnp.maximum(diag_max, A[..., i, i])
    floor = eps * diag_max + jnp.asarray(1e-30, A.dtype)
    L = [[None] * d for _ in range(d)]
    for i in range(d):
        s = A[..., i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(jnp.maximum(s, floor))
        for j in range(i + 1, d):
            t = A[..., j, i]
            for k in range(i):
                t = t - L[j][k] * L[i][k]
            L[j][i] = t / L[i][i]
    return L


def _solve_lower(L, b, d: int):
    """L w = b, unrolled; b (..., d) as a list of columns."""
    w = [None] * d
    for i in range(d):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * w[k]
        w[i] = s / L[i][i]
    return w


def _solve_upper(L, w, d: int):
    """L^T v = w, unrolled."""
    v = [None] * d
    for i in reversed(range(d)):
        s = w[i]
        for k in range(i + 1, d):
            s = s - L[k][i] * v[k]
        v[i] = s / L[i][i]
    return v


def _ball_newton_step(H, b, d: int, dtype):
    """Batched min_{||v||_2 <= 1} 0.5 v^T H v + b^T v with H PSD
    (..., d, d), b (..., d).

    Boundary branch: safeguarded More-Sorensen secular Newton on
    h(lam) = 1/||v(lam)|| - 1 with v(lam) = -(H + lam I)^{-1} b, using the
    exact derivative via q = L^{-1} v:  lam+ = lam + n^2 (n - 1)/||q||^2.
    A [lo, hi] bracket (maintained from sign(n - 1); hi = ||b|| since
    ||v(||b||)|| <= 1) bisects whenever the Newton proposal leaves it —
    the same safeguard discipline as the quadratic track's in-kernel TRS
    (ops/pallas_trs.py), including accepting convergence at the bracket's
    lower end."""
    bn = jnp.linalg.norm(b, axis=-1)
    eye = jnp.eye(d, dtype=dtype)

    def solve_at(lam):
        L = _chol_unrolled(H + lam[..., None, None] * eye, d)
        w = _solve_lower(L, -b, d)                  # L w = -b
        v_cols = _solve_upper(L, w, d)              # L^T v = w
        v = jnp.stack(v_cols, axis=-1)
        q = _solve_lower(L, v, d)                   # L q = v
        qn2 = sum(qi * qi for qi in q)
        return v, qn2

    # lam = 0 attempt: interior solution if feasible (H nonsingular; the
    # Cholesky ridge makes a singular H produce a huge v0, which simply
    # routes to the boundary branch).
    v0, _ = solve_at(jnp.zeros_like(bn))
    n0 = jnp.linalg.norm(v0, axis=-1)
    interior = n0 <= 1.0

    def body(carry, floor):
        lam, lo, hi, _v = carry
        v, qn2 = solve_at(lam)
        n = jnp.linalg.norm(v, axis=-1)
        # Bracket update: n > 1 means lam < lam*, n < 1 means lam > lam*.
        lo = jnp.where(n > 1.0, jnp.maximum(lo, lam), lo)
        hi = jnp.where(n < 1.0, jnp.minimum(hi, lam), hi)
        step = n * n * (n - 1.0) / jnp.maximum(qn2, 1e-30)
        lam_n = lam + step
        # Safeguards: bisect when Newton leaves the bracket (lam_n == lo
        # itself must be accepted — Newton from below converges
        # monotonically), and when a ridged near-singular solve makes the
        # step microscopic while still far from the sphere (the
        # hard-case crawl).  Wide brackets (lam* unknown to orders of
        # magnitude) bisect GEOMETRICALLY — an arithmetic midpoint needs
        # the whole iteration budget just to come down from hi ~ ||b||.
        lo_f = jnp.maximum(lo, floor)
        mid = jnp.where(hi > 100.0 * lo_f, jnp.sqrt(lo_f * hi),
                        0.5 * (lo + hi))
        # NaN-safe bracket test (a NaN proposal must bisect).
        bad = jnp.logical_not(jnp.logical_and(lam_n >= lo, lam_n <= hi))
        stall = jnp.logical_and(n > 1.25,
                                lam_n < lo + 0.01 * (hi - lo))
        lam_n = jnp.where(jnp.logical_or(bad, stall), mid, lam_n)
        lam = jnp.where(interior, lam, lam_n)
        return lam, lo, hi, v

    # Boundary branch starts FROM BELOW (lam ~ 0+, where n0 > 1 by the
    # branch condition): the secular Newton is then monotone increasing
    # and quadratically convergent; a high start (e.g. ||b||) wastes the
    # whole budget bisecting down when lam* is small.  The floor is
    # sqrt(eps)-relative to the problem scale so a singular H stays
    # factorizable without inf/NaN in the triangular solves.
    trH = jnp.trace(H, axis1=-2, axis2=-1)
    scale = 1.0 + trH / d + bn
    lam_floor = (jnp.sqrt(jnp.asarray(jnp.finfo(dtype).eps, dtype))
                 * scale).astype(dtype)
    _, _, _, v = jax.lax.fori_loop(
        0, _SECULAR_ITERS,
        lambda _, c: body(c, lam_floor),
        (lam_floor, jnp.zeros_like(bn), bn.astype(dtype), v0))
    v = jnp.where(interior[..., None], v0, v)
    # Exact feasibility: rescale any boundary iterate that lands a hair
    # outside the sphere.
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(vn, 1.0)


@partial(jax.jit, static_argnames=("iters", "tol", "band_rows"))
def ssn_all_prefixes(
    z: jnp.ndarray,
    y: jnp.ndarray,
    *,
    iters: int = 80,
    tol: float = 2e-4,
    state0=None,
    band_lo=None,
    band_rows: Optional[int] = None,
):
    """Solve the l2-ball exact-FTL program for every prefix at once by
    Huber-continuation semismooth Newton.

    Interface-compatible with models.exact_ftl._admm_all_prefixes:
    returns (X (rows, d), res (rows,), state) where ``res`` is a
    RIGOROUS normalized duality gap min(f - D(u), f)/(1 + f) — D(u) the
    l2-ball LAD dual at a refined feasible dual candidate — used with
    the same fail_tol semantics as the ADMM's consensus residual, and
    ``state`` = (X, mu) continues a previous call (the iteration is
    Markov in it).  ``iters`` caps NEWTON steps (each worth ~25-100x an
    ADMM iteration in progress, ~4x in cost)."""
    T, d = z.shape
    dtype = z.dtype
    if band_rows is None:
        rows, lo = T, jnp.zeros((), jnp.int32)
    else:
        rows, lo = band_rows, jnp.asarray(band_lo, jnp.int32)

    mask = (jnp.arange(T)[None, :] <=
            (lo + jnp.arange(rows))[:, None]).astype(dtype)   # (rows, T)

    def f_mu(R, mu):
        # Huber objective of masked residual rows R (rows, T) at per-row
        # mu (rows, 1).
        a = jnp.abs(R)
        quad = a * a / (2.0 * mu)
        lin = a - 0.5 * mu
        return 0.5 * jnp.sum(jnp.where(a <= mu, quad, lin) * mask, axis=1)

    def newton(state):
        X, mu = state                                      # (rows, d/1)
        Q = jnp.matmul(X, z.T, precision=_HI)              # (rows, T)
        R = (Q - y[None, :]) * mask
        psi = jnp.clip(R / mu, -1.0, 1.0) * mask
        g = 0.5 * jnp.matmul(psi, z, precision=_HI)        # (rows, d)
        zz = (z[:, :, None] * z[:, None, :]).reshape(T, d * d)
        # TWO model candidates per iteration (measured 2.4-4x fewer
        # iterations than either alone):
        #  - IRLS majorizer, w_i = 1/max(|r_i|, mu): the model MAJORIZES
        #    f_mu (MM bound |r'| <= r'^2/(2|r|) + |r|/2, exact on the
        #    Huber zone), so its ball argmin always descends — the
        #    globalization workhorse;
        #  - pure Huber(-zone) Hessian: the true second derivative, which
        #    jumps to the optimum once the active set settles (quadratic
        #    tail) but stalls alone at kink boundaries.
        # Same gradient either way; the line search picks the winner.
        w_irls = mask / (2.0 * jnp.maximum(jnp.abs(R), mu))
        w_hub = ((jnp.abs(R) <= mu).astype(dtype) * mask) / (2.0 * mu)
        H1 = jnp.matmul(w_irls, zz, precision=_HI).reshape(rows, d, d)
        H2 = jnp.matmul(w_hub, zz, precision=_HI).reshape(rows, d, d)
        v1 = _ball_newton_step(
            H1, g - jnp.einsum("rij,rj->ri", H1, X, precision=_HI),
            d, dtype)
        v2 = _ball_newton_step(
            H2, g - jnp.einsum("rij,rj->ri", H2, X, precision=_HI),
            d, dtype)
        # Batched line search on the true Huber objective over both
        # candidates: predictions of x + t (v - x) are affine in t, so
        # one matmul per candidate serves the whole ladder.
        Qv1 = jnp.matmul(v1, z.T, precision=_HI)
        Qv2 = jnp.matmul(v2, z.T, precision=_HI)
        cand_X, cand_Q, cand_f = [], [], []
        for v, Qv in ((v1, Qv1), (v2, Qv2)):
            for t in _LADDER:
                cand_X.append(X + t * (v - X))
                Qt = (1 - t) * Q + t * Qv
                cand_Q.append(Qt)
                cand_f.append(f_mu((Qt - y[None, :]) * mask, mu))
        fs = jnp.stack(cand_f)                             # (K, rows)
        best = jnp.argmin(fs, axis=0)                      # (rows,)
        X_new = jnp.take_along_axis(
            jnp.stack(cand_X), best[None, :, None], axis=0)[0]
        Q_new = jnp.take_along_axis(
            jnp.stack(cand_Q), best[None, :, None], axis=0)[0]
        # Convergence measure: a RIGOROUS DUALITY GAP.  For the l2-ball
        # LAD dual  D(u) = -u^T y - ||Z^T u||  (|u_i| <= 1/2), any
        # feasible u lower-bounds f*, so  res = min(gap, f)/(1 + f)
        # certifies optimality without reference to mu.  (A projected-
        # gradient test is useless here — grad f_mu is 1/mu-Lipschitz and
        # amplifies a 1e-7 x-error into an O(1) residual at small mu; an
        # MM step-size test falsely certifies slow linear crawls.)  The
        # dual candidate falls out of the IRLS model's own KKT system:
        # at its ball minimizer v,  sum_i [w_i (z_i . (v - x)) + psi_i/2]
        # z_i = -lam v,  so  u_i = w_i (z_i . (v - x)) + psi_i/2  is
        # feasible (after clipping) and converges to the true optimal
        # dual — interior (Z^T u -> 0) and boundary (Z^T u -> -lam x)
        # alike.  All quantities are already computed; the gap costs one
        # extra (rows, T) x (T, d) matmul.
        R_new = (Q_new - y[None, :]) * mask
        f_new = 0.5 * jnp.sum(jnp.abs(R_new) * mask, axis=1)
        u = jnp.clip(w_irls * (Qv1 - Q) + 0.5 * psi, -0.5, 0.5) * mask
        g_u = jnp.matmul(u, z, precision=_HI)
        D = (-jnp.sum(u * (y[None, :] * mask), axis=1)
             - jnp.linalg.norm(g_u, axis=-1))
        gap = jnp.minimum(f_new - D, f_new)
        res = jnp.maximum(gap, 0.0) / (1.0 + f_new)
        # Continuation: once the step is stationary at mu-scale, shrink
        # mu (floored near the tolerance scale).
        step = jnp.max(jnp.abs(X_new - X), axis=1)
        solved = step <= 0.1 * mu[:, 0]
        mu = jnp.where(solved[:, None],
                       jnp.maximum(mu * _MU_SHRINK, 0.1 * tol), mu)
        return (X_new, mu), res

    if state0 is None:
        X0 = jnp.zeros((rows, d), dtype)
        # mu0 at the data scale: residuals at x = 0 are |y| (<= max|y|).
        mu0 = jnp.full((rows, 1), jnp.maximum(jnp.max(jnp.abs(y)), 1.0),
                       dtype)
        state = (X0, mu0)
    else:
        state = state0

    def w_cond(carry):
        _, it, res = carry
        # NaN-safe: a NaN residual must KEEP iterating (it is not
        # converged), so negate the <= comparison instead of using >.
        return jnp.logical_and(it < iters,
                               jnp.logical_not(jnp.max(res) <= tol))

    def w_body(carry):
        st, it, _ = carry
        st, res = newton(st)
        return st, it + 1, res

    state, _, res = jax.lax.while_loop(
        w_cond, w_body, (state, jnp.zeros((), jnp.int32),
                         jnp.full((rows,), jnp.inf, dtype)))
    return state[0], res, state


@partial(jax.jit, static_argnames=("iters", "tol"))
def ssn_full(z, y, *, iters: int = 80, tol: float = 2e-4, state0=None):
    """Single full-sequence solve (the exact comparator), same method.
    Returns (x, res, state)."""
    T, d = z.shape
    X, res, state = _ssn_rows_full(z, y, iters=iters, tol=tol,
                                   state0=state0)
    return X[0], res[0], state


def _ssn_rows_full(z, y, *, iters, tol, state0):
    # One-row batch through the banded machinery (band covering only the
    # final prefix) keeps a single compiled formulation.
    T, d = z.shape
    return ssn_all_prefixes(z, y, iters=iters, tol=tol,
                            state0=state0, band_lo=T - 1, band_rows=1)
