"""Structured block-banded engine vs dense oracle/ADMM parity."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.qp import admm, oracle, structured
from tpu_pathopt.smoothing.post_smooth import (build_post_qp,
                                               build_post_structured)
from tpu_pathopt.smoothing.tension2 import (build_tension2_qp,
                                            build_tension2_structured)


def _tension2_inputs(M=24, n_valid=20, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, M)
    x = 30.0 * t + rng.normal(scale=0.1, size=M)
    y = 2.0 * np.sin(3 * t) + rng.normal(scale=0.1, size=M)
    dx, dy = np.gradient(x), np.gradient(y)
    ang = np.arctan2(dy, dx)
    k = np.gradient(ang) / np.maximum(np.hypot(dx, dy), 1e-6)
    s = np.concatenate([[0.0], np.cumsum(np.hypot(np.diff(x), np.diff(y)))])
    f = lambda a: jnp.asarray(a, jnp.float32)
    return f(x), f(y), f(ang), f(k), f(s), jnp.asarray(n_valid, jnp.int32)


def test_tension2_structured_matches_dense():
    cfg = PlannerConfig()
    args = _tension2_inputs()
    qp = build_tension2_structured(*args, cfg)
    Ps, qs, As, ls, us = structured.to_dense(qp)
    ref = oracle.solve(np.asarray(Ps, np.float64), np.asarray(qs, np.float64),
                       np.asarray(As, np.float64), np.asarray(ls, np.float64),
                       np.asarray(us, np.float64))
    assert ref.status == "solved"
    M = args[0].shape[0]
    x_struct = ref.x.reshape(M, 4)

    P, q, A, l, u = build_tension2_qp(*args, cfg)
    ref2 = oracle.solve(np.asarray(P, np.float64), np.asarray(q, np.float64),
                        np.asarray(A, np.float64), np.asarray(l, np.float64),
                        np.asarray(u, np.float64))
    assert ref2.status == "solved"
    # Same optimum for the shared variables (x, y, theta).
    np.testing.assert_allclose(x_struct[:, 0], ref2.x[:M], atol=2e-2)
    np.testing.assert_allclose(x_struct[:, 1], ref2.x[M:2 * M], atol=2e-2)

    # Batched structured solver reaches the same optimum.
    batch = jax.tree_util.tree_map(lambda a: a[None], qp)
    sol = structured.solve_structured_batched(batch)
    assert bool(sol.converged[0])
    np.testing.assert_allclose(np.asarray(sol.v[0, :, 0]), x_struct[:, 0],
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(sol.v[0, :, 1]), x_struct[:, 1],
                               atol=2e-2)


def test_post_structured_matches_dense():
    cfg = PlannerConfig()
    L = 16
    n_layers = jnp.asarray(12, jnp.int32)
    s = jnp.asarray(np.linspace(0, 22, L), jnp.float32)
    lower = jnp.full((L,), -2.0, jnp.float32)
    upper = jnp.full((L,), 2.0, jnp.float32)
    upper = upper.at[5:8].set(0.5)   # pinch
    vehicle_l = jnp.asarray(-0.4, jnp.float32)

    qp = build_post_structured(s, lower, upper, vehicle_l, n_layers, cfg)
    Ps, qs, As, ls, us = structured.to_dense(qp)
    ref = oracle.solve(np.asarray(Ps, np.float64), np.asarray(qs, np.float64),
                       np.asarray(As, np.float64), np.asarray(ls, np.float64),
                       np.asarray(us, np.float64))
    assert ref.status == "solved"
    l_struct = ref.x.reshape(L, 3)[:, 0]

    P, q, A, lb, ub = build_post_qp(s, lower, upper, vehicle_l, n_layers, cfg)
    ref2 = oracle.solve(np.asarray(P, np.float64), np.asarray(q, np.float64),
                        np.asarray(A, np.float64), np.asarray(lb, np.float64),
                        np.asarray(ub, np.float64))
    assert ref2.status == "solved"
    np.testing.assert_allclose(l_struct, ref2.x[:L], atol=2e-2)

    batch = jax.tree_util.tree_map(lambda a: a[None].repeat(3, 0), qp)
    sol = structured.solve_structured_batched(batch)
    assert bool(jnp.all(sol.converged))
    np.testing.assert_allclose(np.asarray(sol.v[0, :, 0]), l_struct,
                               atol=2e-2)


def test_structured_operators_match_dense():
    cfg = PlannerConfig()
    qp = build_tension2_structured(*_tension2_inputs(M=10, n_valid=9), cfg)
    Ps, qs, As, ls, us = structured.to_dense(qp)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=(10, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(structured.a_mul(qp, v)).reshape(-1),
        np.asarray(As) @ np.asarray(v).reshape(-1), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(structured.at_mul(qp, w)).reshape(-1),
        np.asarray(As).T @ np.asarray(w).reshape(-1), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(structured.p_mul(qp, v)).reshape(-1),
        np.asarray(Ps) @ np.asarray(v).reshape(-1), atol=1e-4)
    rho = jnp.abs(jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)) + 0.1
    diag, offp = structured.normal_blocks(qp, rho, 1e-6)
    Md = np.asarray(Ps) + 1e-6 * np.eye(40) + \
        np.asarray(As).T @ np.diag(np.asarray(rho).reshape(-1)) @ np.asarray(As)
    from tpu_pathopt.qp import btridiag
    Ms = np.asarray(btridiag.to_dense(diag, offp[1:]))
    np.testing.assert_allclose(Ms, Md, atol=1e-3, rtol=1e-3)
