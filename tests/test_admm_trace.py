"""Iterate-by-iterate ADMM parity against the float64 oracle (SURVEY.md §7,
"ADMM parity" hard part).

The fixed-point tests in test_qp.py cannot see a *shared* systematic
deviation between ``qp.admm`` and ``qp.oracle`` (e.g. a common mistake in
Ruiz semantics or the adaptive-rho rule would shift both solvers' answers
identically). This pins the raw trajectory instead: both sides run with
termination disabled (eps = 0) in float64, and every check-point iterate
(x, z, y), the adaptive rho_bar trajectory (including its refactor
*decisions*), and the residuals must coincide to float64 round-off. Any
divergence in operation semantics — scaling, rho classes, relaxation,
projection, residual formulas — shows up within a few rounds.

Corner cases demanded by the round-1 review: all-loose rows, equality-only
problems, and rho_bar pinned at its 1e-6 / 1e6 clips.
"""

import numpy as np
import pytest

import jax

from tpu_pathopt.qp import admm, oracle

ROUNDS = 8          # 8 x check_every(25) = 200 iterations compared
CHECK = 25


def _random_qp(rng, nv=8, nc=12, kinds=("eq", "ineq", "loose", "onesided")):
    M = rng.normal(size=(nv, nv))
    P = M @ M.T + 0.1 * np.eye(nv)
    q = rng.normal(size=nv)
    A = rng.normal(size=(nc, nv))
    l = np.empty(nc)
    u = np.empty(nc)
    for i in range(nc):
        kind = kinds[i % len(kinds)]
        a, b = sorted(rng.normal(size=2))
        if kind == "eq":
            l[i] = u[i] = a
        elif kind == "ineq":
            l[i], u[i] = a, b
        elif kind == "loose":
            l[i], u[i] = -1e30, 1e30
        else:
            l[i], u[i] = -1e30, b
    return P, q, A, l, u


def _trace_both(P, q, A, l, u, settings):
    with jax.enable_x64(True):
        import jax.numpy as jnp
        tr = admm.trace_rounds(
            jnp.asarray(P, jnp.float64), jnp.asarray(q, jnp.float64),
            jnp.asarray(A, jnp.float64), jnp.asarray(l, jnp.float64),
            jnp.asarray(u, jnp.float64), settings=settings, n_rounds=ROUNDS)
        tr = {k: np.asarray(v) for k, v in tr.items()}

    ref = oracle.solve(P, q, A, l, u, eps_abs=0.0, eps_rel=0.0,
                       max_iter=ROUNDS * CHECK, check_every=CHECK,
                       rho_bar=settings.rho_bar,
                       adaptive_rho=settings.adaptive_rho, trace=True)
    assert ref.trace["x"].shape[0] == ROUNDS
    return tr, ref.trace


def _compare_fixed_rho(P, q, A, l, u, rho_bar=0.1):
    """Fixed-rho trajectory: f64 round-off is the only divergence channel
    (the relaxed ADMM map is firmly nonexpansive for alpha < 2), so the
    iterates must coincide to near machine precision."""
    st = admm.QPSettings(eps_abs=0.0, eps_rel=0.0, adaptive_rho=False,
                         rho_bar=rho_bar)
    tr, ot = _trace_both(P, q, A, l, u, st)
    for key in ("x", "z", "y", "pri_res", "dua_res"):
        np.testing.assert_allclose(tr[key], ot[key], rtol=1e-7, atol=1e-9,
                                   err_msg=f"iterate {key} diverged")


def _compare_adaptive(P, q, A, l, u, rho_bar=0.1):
    """Adaptive-rho trajectory. A refactor can jump rho by ~1e4 and make the
    iteration stiff enough that f64 library-level round-off (XLA vs LAPACK
    Cholesky/solve orderings) amplifies — bitwise parity after a refactor is
    not an algorithmic property. What IS the algorithm: the refactor
    *decisions* (which rounds adapt, including saturation at the 1e-6/1e6
    clips) and the rho_bar values to ~0.5%, plus iterate agreement at the
    same relative level."""
    st = admm.QPSettings(eps_abs=0.0, eps_rel=0.0, rho_bar=rho_bar)
    tr, ot = _trace_both(P, q, A, l, u, st)
    # Once the trajectory has effectively converged (residuals at the f64
    # noise floor) the residual RATIO driving rho adaptation is pure noise —
    # compare only the meaningful prefix.
    live = (ot["pri_res"] > 1e-8) & (ot["dua_res"] > 1e-10)
    k = int(np.argmin(live)) if not live.all() else len(live)
    k = max(k, 2)
    np.testing.assert_allclose(tr["rho_bar"][:k], ot["rho_bar"][:k],
                               rtol=5e-3,
                               err_msg="adaptive-rho trajectories diverged")
    # Identical refactor decision pattern (rho changed this round or not).
    changed = lambda r: np.abs(np.diff(np.log(r[:k]))) > 1e-12
    np.testing.assert_array_equal(changed(tr["rho_bar"]),
                                  changed(ot["rho_bar"]))
    scale = max(np.abs(ot["x"]).max(), 1.0)
    np.testing.assert_allclose(tr["x"][:k], ot["x"][:k], rtol=2e-2,
                               atol=2e-2 * scale, err_msg="x diverged")


def test_trace_parity_fixed_rho_mixed_rows():
    rng = np.random.default_rng(0)
    _compare_fixed_rho(*_random_qp(rng))


def test_trace_parity_fixed_rho_equality_only():
    rng = np.random.default_rng(1)
    _compare_fixed_rho(*_random_qp(rng, kinds=("eq",)))


def test_trace_parity_fixed_rho_all_loose():
    rng = np.random.default_rng(2)
    _compare_fixed_rho(*_random_qp(rng, kinds=("loose",)))


def test_trace_parity_adaptive_mixed_rows():
    rng = np.random.default_rng(0)
    _compare_adaptive(*_random_qp(rng))


def test_trace_parity_adaptive_equality_only():
    rng = np.random.default_rng(1)
    _compare_adaptive(*_random_qp(rng, kinds=("eq",)))


@pytest.mark.parametrize("rho0", [1e-6, 1e6])
def test_trace_parity_rho_at_clip(rho0):
    """rho_bar starting at (and pushing against) its 1e-6 / 1e6 clip: the
    clipped adaptive updates must still match the oracle."""
    rng = np.random.default_rng(3)
    _compare_adaptive(*_random_qp(rng), rho_bar=rho0)


def test_trace_matches_solver_fixed_point():
    """The traced trajectory converges to what solve_qp returns (same code
    path — guard against the tracer drifting from the solver)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(4)
    P, q, A, l, u = _random_qp(rng)
    st = admm.QPSettings(eps_abs=1e-6, eps_rel=1e-6)
    with jax.enable_x64(True):
        args = tuple(jnp.asarray(a, jnp.float64) for a in (P, q, A, l, u))
        sol = admm.solve_qp(*args, settings=st)
        tr = admm.trace_rounds(*args, settings=st, n_rounds=40)
        assert bool(sol.converged)
        np.testing.assert_allclose(np.asarray(tr["x"][-1]),
                                   np.asarray(sol.x), atol=1e-5)
