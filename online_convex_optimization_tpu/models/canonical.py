"""Canonical selection on degenerate exact-FTL optima (l2 ball).

THE PROBLEM (docs/DESIGN.md "Canonical selection"): on the deterministic
w = 0 families (label flips, switching leaders — the reference's own
adversarial streams, sequence_generation.py:24-60) the prefix programs

    minimize_{||x|| <= 1}  f_t(x) = 0.5 sum_{i<=t} |<z_i, x> - y_i|

have NON-UNIQUE minimizer sets (interpolation flats, 0-slabs), so "the"
exact-FTL trajectory depends on which point the iterative solver lands
on — historically whatever the banded ADMM + polish happened to select,
which pins the committed artifacts to one solver configuration.

THE CONTRACT: the canonical action is the MINIMUM-l2-NORM point of the
optimal face.  It is solver-independent, idempotent, and (on the
structures below) computable in closed form from the data alone:

  *  interpolation faces (f* = 0 or a kink face with active rows A):
     the lstsq minimum-norm interpolant of  z_A x = y_A;
  *  0-flats (w = sum y_i z_i = 0 slabs): the zero vector;
  *  unique optima: the face has one point; canonicalization is the
     identity.

RIGOR: a candidate is accepted only if EXACT first-order optimality is
verifiable — feasibility of the subgradient system

    sum_{i notin A} 0.5 sign(r_i) z_i  +  sum_{i in A} u_i z_i
        + lam * x  =  0,     u in [-1/2, 1/2]^A,  lam >= 0
    (lam = 0 unless ||x|| = 1)

checked by a small linear program (scipy linprog, d equality rows).  No
objective-value oracle is needed, so the canonical solve runs host-side
in f64 with NO device solver at all — which is what unlocks the
T_max-prefix dedup for the deterministic families in the exact pipeline
(every horizon of a deterministic family is a prefix of the longest
cell; see experiments/evaluate.py).

Reference parity: the reference simply returns whatever CVXPY/ECOS
selects on these degenerate programs (/root/reference/exact_ftl.py:
119-128) — a solver-version-dependent point; the canonical contract is
strictly stronger.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from online_convex_optimization_tpu.models.polish import objective

_TAUS = (1e-9, 1e-7, 1e-5, 1e-3)


def _optimality_lp(z: np.ndarray, y: np.ndarray, x: np.ndarray,
                   active: np.ndarray, tol: float = 1e-9) -> bool:
    """Exact first-order optimality of ``x`` with kink set ``active``:
    feasibility of the subgradient system above, as an LP with slack
    minimization (optimal slack ~ 0 iff feasible)."""
    from scipy.optimize import linprog

    d = z.shape[1]
    r = z @ x - y
    out = ~active
    g_out = 0.5 * (np.sign(r[out])[:, None] * z[out]).sum(axis=0) \
        if out.any() else np.zeros(d)
    zA = z[active]
    nA = int(active.sum())
    nx = float(np.linalg.norm(x))
    boundary = nx > 1.0 - 1e-9
    # Variables: u (nA), lam (1 if boundary else 0), s+ (d), s- (d).
    n_lam = 1 if boundary else 0
    n_var = nA + n_lam + 2 * d
    # Equalities: zA^T u + lam x + s+ - s- = -g_out
    A_eq = np.zeros((d, n_var))
    if nA:
        A_eq[:, :nA] = zA.T
    if n_lam:
        A_eq[:, nA] = x
    A_eq[:, nA + n_lam:nA + n_lam + d] = np.eye(d)
    A_eq[:, nA + n_lam + d:] = -np.eye(d)
    b_eq = -g_out
    c = np.zeros(n_var)
    c[nA + n_lam:] = 1.0            # minimize total slack
    bounds = ([(-0.5, 0.5)] * nA + ([(0, None)] if n_lam else [])
              + [(0, None)] * (2 * d))
    res = linprog(c, A_eq=A_eq, b_eq=b_eq, bounds=bounds, method="highs")
    return bool(res.success) and float(res.fun) <= tol


def canonicalize(z: np.ndarray, y: np.ndarray, x: np.ndarray,
                 norm: str = "l2") -> np.ndarray:
    """Map an optimal ``x`` to the canonical (min-l2-norm) point of its
    optimal face.  Identity when no strictly-smaller-norm optimal
    candidate verifies (unique optima; faces outside the covered
    structures).  Never degrades the objective (candidates must match
    f(x) to 1e-9)."""
    if norm != "l2":
        return np.asarray(x, np.float64)    # canonical contract is l2-only
    z = np.asarray(z, np.float64)
    y = np.asarray(y, np.float64)
    x = np.asarray(x, np.float64)
    f_x = objective(z, y, x)
    best = x
    best_n = float(np.linalg.norm(x))
    for cand in _candidates(z, y, x):
        n = float(np.linalg.norm(cand))
        if n >= best_n - 1e-12:
            continue
        if objective(z, y, cand) <= f_x + 1e-9:
            best, best_n = cand, n
    return best


def _candidates(z, y, x):
    d = z.shape[1]
    yield np.zeros(d)                        # 0-flat
    r = z @ x - y
    for tau in _TAUS:
        active = np.abs(r) <= tau
        if active.any():
            zA, yA = z[active], y[active]
            x_par, *_ = np.linalg.lstsq(zA, yA, rcond=None)
            if (np.max(np.abs(zA @ x_par - yA), initial=0.0) <= 1e-9
                    and np.linalg.norm(x_par) <= 1.0 + 1e-12):
                yield x_par / max(np.linalg.norm(x_par), 1.0)


def canonical_prefix_actions(z: np.ndarray, y: np.ndarray,
                             norm: str = "l2") -> Optional[np.ndarray]:
    """All-prefix canonical actions computed host-side WITHOUT a device
    solver: per prefix, propose the structural candidates (0-point, the
    lstsq min-norm interpolants of growing kink sets) and accept the
    smallest-norm candidate whose EXACT optimality verifies by the
    subgradient LP.  Returns (T+1, d) with row 0 = 0, or None if any
    prefix has no verifiable candidate (caller falls back to the
    iterative solver path).

    Candidate generation exploits the deterministic families' structure:
    their rows repeat in a handful of DISTINCT (row, label) groups, and
    every optimal face is the interpolation set of some subset of
    groups (or the 0-flat).  All 2^K - 1 subset interpolants (K <= 6
    distinct groups; more returns None) plus the zero vector are
    proposed smallest-norm-first; the first LP-verified candidate wins.
    General unstructured data is out of scope BY DESIGN — those cells
    keep the iterative solver and get ``canonicalize`` applied after."""
    if norm != "l2":
        return None
    z = np.asarray(z, np.float64)
    y = np.asarray(y, np.float64)
    T, d = z.shape
    acts = np.zeros((T + 1, d))
    # Distinct (row, label) groups over the WHOLE sequence (prefix
    # groups are subsets; group count is the structure bound).
    keys = np.round(np.concatenate([z, y[:, None]], axis=1), 12)
    _, inv = np.unique(keys, axis=0, return_inverse=True)
    if inv.max() + 1 > 6:
        return None
    from itertools import combinations

    for t in range(1, T + 1):
        zt, yt = z[:t], y[:t]
        gids = sorted(set(inv[:t].tolist()))
        reps = {g: int(np.flatnonzero(inv[:t] == g)[0]) for g in gids}
        cands = [np.zeros(d)]
        for k in range(1, len(gids) + 1):
            for sub in combinations(gids, k):
                rows = [reps[g] for g in sub]
                zA, yA = zt[rows], yt[rows]
                x_par, *_ = np.linalg.lstsq(zA, yA, rcond=None)
                if (np.max(np.abs(zA @ x_par - yA), initial=0.0) <= 1e-9
                        and np.linalg.norm(x_par) <= 1.0 + 1e-12):
                    cands.append(x_par)
        cands.sort(key=lambda c: float(np.linalg.norm(c)))
        found = None
        for cand in cands:
            rr = zt @ cand - yt
            for tau in (1e-9, 1e-7):
                active = np.abs(rr) <= tau
                if _optimality_lp(zt, yt, cand, active):
                    found = cand
                    break
            if found is not None:
                break
        if found is None:
            return None
        acts[t] = found
    return acts
