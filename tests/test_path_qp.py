import jax.numpy as jnp
import numpy as np

from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.qp import oracle
from tpu_pathopt.qp.admm import QPSettings
from tpu_pathopt.solver import assembly, path_solver


def _scenario_qp(N=40, n_valid=None, config=PlannerConfig(), seed=0):
    """Synthetic path QP: gently curving reference, wavy corridor."""
    rng = np.random.default_rng(seed)
    n_valid = N if n_valid is None else n_valid
    ds = config.output_spacing
    s = np.arange(N) * ds
    k_ref = 0.05 * np.sin(s / 5.0)
    heading_last = 0.3
    front_ub = 2.0 + 0.5 * np.sin(s / 3.0)
    front_lb = -2.0 + 0.4 * np.cos(s / 4.0)
    rear_ub = 2.2 + 0.3 * np.sin(s / 3.5)
    rear_lb = -2.1 + 0.3 * np.cos(s / 4.5)
    qp = assembly.assemble_path_qp(
        ref_s=jnp.asarray(s, jnp.float32),
        ref_k=jnp.asarray(k_ref, jnp.float32),
        ref_heading_last=heading_last,
        input_l=jnp.zeros(N, jnp.float32),
        input_e=jnp.zeros(N, jnp.float32),
        input_k=jnp.asarray(k_ref, jnp.float32),
        front_lb=jnp.asarray(front_lb, jnp.float32),
        front_ub=jnp.asarray(front_ub, jnp.float32),
        rear_lb=jnp.asarray(rear_lb, jnp.float32),
        rear_ub=jnp.asarray(rear_ub, jnp.float32),
        init_offset=0.4, init_heading_error=0.1, start_k=0.0,
        target_heading=heading_last + 0.05, blocked=False,
        n_valid=n_valid, config=config)
    return qp


def test_normal_blocks_match_dense():
    qp = _scenario_qp(N=12)
    rho_knot, rho_end = assembly.rho_classes(qp)
    rho_knot = 0.1 * rho_knot
    rho_end = 0.1 * rho_end
    sigma = 1e-6
    diag, off = assembly.normal_blocks(qp, rho_knot, rho_end, sigma)
    from tpu_pathopt.qp import btridiag
    M_struct = np.asarray(btridiag.to_dense(diag, off), np.float64)
    P, q, A, l, u = assembly.to_dense(qp)
    P, A = np.asarray(P, np.float64), np.asarray(A, np.float64)
    rho_vec = np.concatenate([np.asarray(rho_knot).reshape(-1),
                              np.asarray(rho_end)])
    M_dense = P + sigma * np.eye(P.shape[0]) + A.T @ (rho_vec[:, None] * A)
    np.testing.assert_allclose(M_struct, M_dense, atol=1e-4, rtol=1e-4)


def test_a_mul_matches_dense():
    qp = _scenario_qp(N=10)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=(10, 6)), jnp.float32)
    zk, ze = assembly.a_mul(qp, v)
    P, q, A, l, u = assembly.to_dense(qp)
    z_dense = np.asarray(A, np.float64) @ np.asarray(v).reshape(-1)
    z_struct = np.concatenate([np.asarray(zk).reshape(-1), np.asarray(ze)])
    np.testing.assert_allclose(z_struct, z_dense, atol=1e-4)
    # Adjoint.
    w = rng.normal(size=z_dense.shape)
    wk = jnp.asarray(w[:-2].reshape(10, 6), jnp.float32)
    we = jnp.asarray(w[-2:], jnp.float32)
    at = np.asarray(assembly.at_mul(qp, wk, we)).reshape(-1)
    np.testing.assert_allclose(at, np.asarray(A).T @ w, atol=1e-4, rtol=1e-4)


def test_path_qp_matches_oracle():
    qp = _scenario_qp(N=40)
    sol = path_solver.solve_path_qp(
        qp, settings=QPSettings(eps_abs=1e-4, eps_rel=1e-4, max_iter=10000))
    assert bool(sol.converged)
    P, q, A, l, u = assembly.to_dense(qp)
    ref = oracle.solve(np.asarray(P, np.float64), np.asarray(q, np.float64),
                       np.asarray(A, np.float64), np.asarray(l, np.float64),
                       np.asarray(u, np.float64), eps_abs=1e-7, eps_rel=1e-7,
                       max_iter=100000)
    assert ref.status == "solved"
    v_ref = ref.x.reshape(40, 6)
    v = np.asarray(sol.v, np.float64)
    # l, e_psi, kappa parity (u and slacks are weakly determined).
    np.testing.assert_allclose(v[:, 0], v_ref[:, 0], atol=5e-3)
    np.testing.assert_allclose(v[:, 1], v_ref[:, 1], atol=5e-3)
    np.testing.assert_allclose(v[:, 2], v_ref[:, 2], atol=5e-3)


def test_padding_invariance():
    qp_small = _scenario_qp(N=24)
    qp_padded = _scenario_qp(N=32, n_valid=24)
    st = QPSettings(eps_abs=1e-5, eps_rel=1e-5, max_iter=10000)
    sol_small = path_solver.solve_path_qp(qp_small, settings=st)
    sol_padded = path_solver.solve_path_qp(qp_padded, settings=st)
    assert bool(sol_small.converged) and bool(sol_padded.converged)
    np.testing.assert_allclose(np.asarray(sol_padded.v[:24, :3]),
                               np.asarray(sol_small.v[:, :3]), atol=2e-3)
    # Padded knots are pinned to zero.
    np.testing.assert_allclose(np.asarray(sol_padded.v[24:, :3]), 0.0,
                               atol=1e-3)


def test_warm_start_second_pass():
    qp = _scenario_qp(N=40)
    st = QPSettings()
    sol1 = path_solver.solve_path_qp(qp, settings=st)
    # Re-linearize around pass-1 solution (SQP pass 2) and warm start.
    sol2 = path_solver.solve_path_qp(
        qp, v0=sol1.v, y0_knot=sol1.y_knot, y0_end=sol1.y_end, settings=st)
    assert bool(sol2.converged)
    assert int(sol2.iters) <= int(sol1.iters)


def test_trace_path_rounds_matches_solver():
    """The per-round tracer (the CLI's --verbose-qp surface, mirroring the
    reference's OSQP verbose=true) shares the production round body: its
    first converged round must report exactly the solver's final iteration
    count and residuals, and stay frozen afterwards."""
    qp = _scenario_qp()
    st = QPSettings()
    sol = path_solver.solve_path_qp(qp, settings=st)
    assert bool(sol.converged)
    tr = path_solver.trace_path_rounds(qp, st, n_rounds=12)
    conv = np.asarray(tr["converged"])
    assert conv.any()
    r = int(np.argmax(conv))
    assert int(tr["iters"][r]) == int(sol.iters)
    np.testing.assert_allclose(float(tr["pri_res"][r]), float(sol.pri_res),
                               rtol=1e-6)
    np.testing.assert_allclose(float(tr["dua_res"][r]), float(sol.dua_res),
                               rtol=1e-6)
    # Frozen after convergence.
    assert np.all(np.asarray(tr["iters"])[r:] == int(sol.iters))
