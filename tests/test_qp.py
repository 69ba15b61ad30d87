import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathopt.qp import admm, oracle


def _random_qp(rng, nv=30, nc=40, n_eq=8):
    """Strictly convex random QP with a mix of equality/inequality/loose rows."""
    F = rng.normal(size=(nv, nv))
    P = F @ F.T / nv + np.eye(nv)
    q = rng.normal(size=nv)
    A = rng.normal(size=(nc, nv))
    x_feas = rng.normal(size=nv) * 0.5
    Ax = A @ x_feas
    l = Ax - rng.uniform(0.1, 2.0, size=nc)
    u = Ax + rng.uniform(0.1, 2.0, size=nc)
    l[:n_eq] = u[:n_eq] = Ax[:n_eq]
    # some loose rows
    l[n_eq:n_eq + 3] = -admm.INFTY
    u[n_eq:n_eq + 3] = admm.INFTY
    return P, q, A, l, u


def test_scalar_box_qp():
    # min (x-1)^2 s.t. 0 <= x <= 0.5  ->  x = 0.5
    P = jnp.asarray([[2.0]])
    q = jnp.asarray([-2.0])
    A = jnp.asarray([[1.0]])
    sol = admm.solve_qp(P, q, A, jnp.asarray([0.0]), jnp.asarray([0.5]))
    assert bool(sol.converged)
    np.testing.assert_allclose(float(sol.x[0]), 0.5, atol=2e-3)


def test_equality_qp_matches_kkt():
    rng = np.random.default_rng(0)
    nv, nc = 20, 10
    F = rng.normal(size=(nv, nv))
    P = F @ F.T / nv + np.eye(nv)
    q = rng.normal(size=nv)
    A = rng.normal(size=(nc, nv))
    b = rng.normal(size=nc)
    # KKT: [P A^T; A 0] [x; nu] = [-q; b]
    K = np.block([[P, A.T], [A, np.zeros((nc, nc))]])
    sol_kkt = np.linalg.solve(K, np.concatenate([-q, b]))[:nv]
    sol = admm.solve_qp(jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
                        jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
                        jnp.asarray(b, jnp.float32),
                        settings=admm.QPSettings(eps_abs=1e-5, eps_rel=1e-5))
    assert bool(sol.converged)
    np.testing.assert_allclose(np.asarray(sol.x), sol_kkt, atol=5e-3)


def test_random_qps_match_oracle():
    rng = np.random.default_rng(1)
    for trial in range(3):
        P, q, A, l, u = _random_qp(rng)
        ref = oracle.solve(P, q, A, l, u, eps_abs=1e-6, eps_rel=1e-6)
        assert ref.status == "solved"
        sol = admm.solve_qp(
            jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
            jnp.asarray(A, jnp.float32), jnp.asarray(l, jnp.float32),
            jnp.asarray(u, jnp.float32),
            settings=admm.QPSettings(eps_abs=1e-4, eps_rel=1e-4))
        assert bool(sol.converged), f"trial {trial} did not converge"
        obj_ref = 0.5 * ref.x @ P @ ref.x + q @ ref.x
        x = np.asarray(sol.x, np.float64)
        obj = 0.5 * x @ P @ x + q @ x
        assert obj <= obj_ref + 1e-2 * (1 + abs(obj_ref))
        np.testing.assert_allclose(x, ref.x, atol=2e-2)
        # Feasibility.
        Ax = A @ x
        assert np.all(Ax >= l - 5e-3) and np.all(Ax <= u + 5e-3)


def test_warm_start_reduces_iterations():
    rng = np.random.default_rng(2)
    P, q, A, l, u = _random_qp(rng)
    Pj, qj = jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32)
    Aj = jnp.asarray(A, jnp.float32)
    lj, uj = jnp.asarray(l, jnp.float32), jnp.asarray(u, jnp.float32)
    cold = admm.solve_qp(Pj, qj, Aj, lj, uj)
    warm = admm.solve_qp(Pj, qj, Aj, lj, uj, x0=cold.x, y0=cold.y)
    assert bool(warm.converged)
    assert int(warm.iters) <= int(cold.iters)


def test_vmap_batch_matches_single():
    rng = np.random.default_rng(3)
    probs = [_random_qp(rng, nv=12, nc=16, n_eq=4) for _ in range(4)]
    Ps = jnp.asarray(np.stack([p[0] for p in probs]), jnp.float32)
    qs = jnp.asarray(np.stack([p[1] for p in probs]), jnp.float32)
    As = jnp.asarray(np.stack([p[2] for p in probs]), jnp.float32)
    ls = jnp.asarray(np.stack([p[3] for p in probs]), jnp.float32)
    us = jnp.asarray(np.stack([p[4] for p in probs]), jnp.float32)
    batched = jax.vmap(lambda P, q, A, l, u: admm.solve_qp(P, q, A, l, u))(
        Ps, qs, As, ls, us)
    assert bool(jnp.all(batched.converged))
    for i in range(4):
        single = admm.solve_qp(Ps[i], qs[i], As[i], ls[i], us[i])
        np.testing.assert_allclose(np.asarray(batched.x[i]),
                                   np.asarray(single.x), atol=5e-3)


def test_batched_solver_matches_scalar():
    """solve_qp_batched must agree with the scalar solver and the oracle."""
    rng = np.random.default_rng(7)
    probs = [_random_qp(rng) for _ in range(4)]
    P = jnp.asarray(np.stack([p[0] for p in probs]), jnp.float32)
    q = jnp.asarray(np.stack([p[1] for p in probs]), jnp.float32)
    A = jnp.asarray(np.stack([p[2] for p in probs]), jnp.float32)
    l = jnp.asarray(np.stack([p[3] for p in probs]), jnp.float32)
    u = jnp.asarray(np.stack([p[4] for p in probs]), jnp.float32)
    sol = admm.solve_qp_batched(P, q, A, l, u)
    assert bool(jnp.all(sol.converged))
    for i, (Pn, qn, An, ln, un) in enumerate(probs):
        ref = oracle.solve(Pn, qn, An, ln, un)
        assert ref.status == "solved"
        np.testing.assert_allclose(np.asarray(sol.x[i]), ref.x,
                                   atol=5e-2, rtol=5e-2)


def test_batched_solver_warm_start():
    rng = np.random.default_rng(8)
    probs = [_random_qp(rng) for _ in range(3)]
    P = jnp.asarray(np.stack([p[0] for p in probs]), jnp.float32)
    q = jnp.asarray(np.stack([p[1] for p in probs]), jnp.float32)
    A = jnp.asarray(np.stack([p[2] for p in probs]), jnp.float32)
    l = jnp.asarray(np.stack([p[3] for p in probs]), jnp.float32)
    u = jnp.asarray(np.stack([p[4] for p in probs]), jnp.float32)
    cold = admm.solve_qp_batched(P, q, A, l, u)
    warm = admm.solve_qp_batched(P, q, A, l, u, x0=cold.x, y0=cold.y)
    assert bool(jnp.all(warm.converged))
    assert bool(jnp.all(warm.iters <= cold.iters))
