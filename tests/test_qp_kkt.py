"""Method-independent optimality certification of the float64 QP oracle.

The parity chain of this repo bottoms out in ``qp/oracle.py`` — a NumPy
re-implementation of the OSQP algorithm (the real OSQP C library is not
installable in this image). The engine's ADMM matches the oracle iterate by
iterate (tests/test_admm_trace.py), but both sides encode the same reading of
the OSQP paper. This module closes that soft spot with a certificate that
does NOT use ADMM at all:

for small random block-banded QPs (the shapes the engine actually solves,
reference: base_solver.cpp:119-261 consumes OSQP the same way), run the
oracle at tight tolerance, read off the active set, and

1. solve the equality-constrained KKT system on that active set EXACTLY
   (one dense linear solve — no operator splitting, no iteration),
2. verify the exact KKT point: stationarity, primal feasibility of the
   inactive rows, and the multiplier sign conditions (y >= 0 on active upper
   bounds, y <= 0 on active lower bounds) — for a convex QP this is a
   sufficient global-optimality certificate,
3. assert the oracle's optimum matches the certified exact optimum to 1e-8.

If the oracle mis-read the OSQP paper in a way that changes the answer (not
just the iterate path), this test fails.
"""

import numpy as np
import pytest

from tpu_pathopt.qp import oracle

ACT_TOL = 1e-7      # active-set identification tolerance on |Ax - bound|
SIGN_TOL = 1e-9     # multiplier sign slack
X_TOL = 1e-8        # oracle-vs-certified optimum tolerance


def _random_banded_qp(rng, nv, nc, n_eq, bandwidth=4):
    """A well-conditioned strictly convex QP with a banded constraint matrix
    (block-banded like every QP shape in the pipeline), mixing equality rows
    (l == u), two-sided inequalities, and a loose row."""
    B = rng.standard_normal((nv, nv)) * (
        np.abs(np.arange(nv)[:, None] - np.arange(nv)[None, :]) <= bandwidth)
    P = B @ B.T / nv + np.eye(nv)
    q = rng.standard_normal(nv)
    A = rng.standard_normal((nc, nv)) * (
        np.abs(np.linspace(0, nv - 1, nc)[:, None]
               - np.arange(nv)[None, :]) <= bandwidth)
    # Keep rows nonzero.
    A[np.abs(A).max(axis=1) < 1e-3, 0] = 1.0
    x_feas = rng.standard_normal(nv) * 0.3
    Ax = A @ x_feas
    l = Ax - rng.uniform(0.05, 1.0, nc)
    u = Ax + rng.uniform(0.05, 1.0, nc)
    eq_rows = rng.choice(nc, size=n_eq, replace=False)
    l[eq_rows] = u[eq_rows] = Ax[eq_rows]
    if nc > n_eq:                       # one loose (±inf) row
        loose = [r for r in range(nc) if r not in set(eq_rows)][0]
        l[loose] = -oracle.OSQP_INFTY
        u[loose] = oracle.OSQP_INFTY
    return P, q, A, l, u


def _certify_kkt(P, q, A, l, u, res):
    """Exact equality-constrained KKT solve on the oracle-reported active set;
    returns the certified optimum after checking the KKT conditions."""
    Ax = A @ res.x
    act_lo = (Ax - l <= ACT_TOL) | (res.y < -ACT_TOL)
    act_hi = (u - Ax <= ACT_TOL) | (res.y > ACT_TOL)
    act = act_lo | act_hi
    b = np.where(act_hi, u, l)

    nv = P.shape[0]
    A_act = A[act]
    b_act = b[act]
    na = A_act.shape[0]
    KKT = np.block([[P, A_act.T], [A_act, np.zeros((na, na))]])
    rhs = np.concatenate([-q, b_act])
    sol, *_ = np.linalg.lstsq(KKT, rhs, rcond=None)
    x_exact = sol[:nv]
    nu = sol[nv:]

    # The KKT system must actually be solved (consistent active set).
    np.testing.assert_allclose(KKT @ sol, rhs, atol=1e-9 * max(
        1.0, np.abs(rhs).max()))

    # Stationarity of the exact point: P x + q + A_act^T nu = 0 (by solve),
    # with zero multipliers on inactive rows — so full stationarity holds.
    y_exact = np.zeros(A.shape[0])
    y_exact[act] = nu

    # Primal feasibility (inactive rows strictly inside, active rows on bound).
    Axe = A @ x_exact
    assert np.all(Axe >= l - 1e-7) and np.all(Axe <= u + 1e-7)

    # Dual sign conditions on non-equality rows (equality rows have free sign).
    ineq = (u - l) > 1e-12
    hi = act_hi & ~act_lo & ineq
    lo = act_lo & ~act_hi & ineq
    assert np.all(y_exact[hi] >= -SIGN_TOL), "upper-active multiplier < 0"
    assert np.all(y_exact[lo] <= SIGN_TOL), "lower-active multiplier > 0"

    return x_exact, y_exact


@pytest.mark.parametrize("seed,nv,nc,n_eq", [
    (0, 12, 10, 3),
    (1, 20, 24, 6),
    (2, 30, 28, 8),
    (3, 30, 40, 10),
    (4, 24, 24, 0),
])
def test_oracle_optimum_certified_by_exact_kkt(seed, nv, nc, n_eq):
    rng = np.random.default_rng(seed)
    P, q, A, l, u = _random_banded_qp(rng, nv, nc, n_eq)
    res = oracle.solve(P, q, A, l, u, eps_abs=1e-11, eps_rel=1e-11,
                       max_iter=400000, check_every=25)
    assert res.status == "solved"
    x_exact, _ = _certify_kkt(P, q, A, l, u, res)
    scale = max(1.0, np.abs(x_exact).max())
    np.testing.assert_allclose(res.x, x_exact, atol=X_TOL * scale)
    # And the certified cost is no worse than any feasible perturbation of it
    # (sanity spot-check of convexity/sufficiency, 20 random directions).
    cost = lambda x: 0.5 * x @ P @ x + q @ x
    c0 = cost(x_exact)
    for _ in range(20):
        d = rng.standard_normal(nv) * 1e-3
        x_pert = x_exact + d
        Axp = A @ x_pert
        if np.all(Axp >= l - 1e-12) and np.all(Axp <= u + 1e-12):
            assert cost(x_pert) >= c0 - 1e-12


def test_oracle_equality_only_matches_direct_kkt():
    """Pure equality-constrained QP: the optimum has a closed form; the
    oracle must hit it without any active-set logic in the cross-check."""
    rng = np.random.default_rng(7)
    nv, nc = 15, 6
    B = rng.standard_normal((nv, nv))
    P = B @ B.T / nv + np.eye(nv)
    q = rng.standard_normal(nv)
    A = rng.standard_normal((nc, nv))
    b = rng.standard_normal(nc) * 0.3
    res = oracle.solve(P, q, A, b, b, eps_abs=1e-11, eps_rel=1e-11,
                       max_iter=400000)
    assert res.status == "solved"
    KKT = np.block([[P, A.T], [A, np.zeros((nc, nc))]])
    sol = np.linalg.solve(KKT, np.concatenate([-q, b]))
    np.testing.assert_allclose(res.x, sol[:nv], atol=1e-8)
    np.testing.assert_allclose(res.y, sol[nv:], atol=1e-6)
