import jax.numpy as jnp
import numpy as np

from tpu_pathopt import maps
from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.qp import admm, oracle, structured
from tpu_pathopt.smoothing import segment_raw_reference
from tpu_pathopt.smoothing.tension import (build_tension_qp,
                                           build_tension_qp_blocks,
                                           tension_smooth)
from tpu_pathopt.smoothing.tension2 import build_tension2_qp, tension2_smooth


def _wavy_input(M=32, n_valid=28):
    s = np.arange(M, dtype=np.float64)
    x = s.copy()
    y = 0.8 * np.sin(s / 3.0)
    dx = np.gradient(x, s)
    dy = np.gradient(y, s)
    ang = np.arctan2(dy, dx)
    ddx = np.gradient(dx, s)
    ddy = np.gradient(dy, s)
    k = (dx * ddy - dy * ddx) / (dx * dx + dy * dy) ** 1.5
    # Hold-last padding.
    for arr in (x, y, ang, k):
        arr[n_valid:] = arr[n_valid - 1]
    s[n_valid:] = s[n_valid - 1]
    return x, y, ang, k, s, n_valid


def test_tension2_matches_oracle():
    x, y, ang, k, s, nv = _wavy_input()
    cfg = PlannerConfig()
    s_pad = s.copy()
    s_pad[nv:] = s[nv - 1] + np.arange(1, len(s) - nv + 1)
    P, q, A, l, u = build_tension2_qp(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(ang, jnp.float32), jnp.asarray(k, jnp.float32),
        jnp.asarray(s_pad, jnp.float32), jnp.asarray(nv), cfg)
    sol = admm.solve_qp(P, q, A, l, u,
                        settings=admm.QPSettings(eps_abs=1e-5, eps_rel=1e-5))
    assert bool(sol.converged)
    ref = oracle.solve(np.asarray(P, np.float64), np.asarray(q, np.float64),
                       np.asarray(A, np.float64), np.asarray(l, np.float64),
                       np.asarray(u, np.float64), eps_abs=1e-8, eps_rel=1e-8,
                       max_iter=200000)
    assert ref.status == "solved"
    M = len(x)
    np.testing.assert_allclose(np.asarray(sol.x[:2 * M], np.float64),
                               ref.x[:2 * M], atol=5e-3)


def test_tension2_smooths_and_stays_close():
    x, y, ang, k, s, nv = _wavy_input()
    cfg = PlannerConfig()
    s_pad = s.copy()
    s_pad[nv:] = s[nv - 1] + np.arange(1, len(s) - nv + 1)
    xo, yo, so, n2, conv = tension2_smooth(
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(ang, jnp.float32), jnp.asarray(k, jnp.float32),
        jnp.asarray(s_pad, jnp.float32), jnp.asarray(nv), cfg)
    assert bool(conv)
    xo = np.asarray(xo)[:nv]
    yo = np.asarray(yo)[:nv]
    # Stays near the input...
    assert np.abs(yo - y[:nv]).max() < 1.0
    # ...but with smaller heading wiggle than the input.
    def wiggle(xx, yy):
        h = np.arctan2(np.diff(yy), np.diff(xx))
        return np.abs(np.diff(h)).sum()
    assert wiggle(xo, yo) < wiggle(x[:nv], y[:nv])


def _open_map(res=0.4, size=100, half_width=15.0):
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[:, np.abs(yy) >= half_width] = True
    return maps.build_map(jnp.asarray(mask), resolution=res)


def test_tension_blocks_densify_to_dense_builder():
    """The 3-point block-banded TENSION assembly must be exactly the dense
    [x(M), y(M), d(M)] problem under the interleaved-variable permutation."""
    x, y, ang, k, s, nv = _wavy_input(M=33, n_valid=29)
    gm = _open_map()
    cfg = PlannerConfig()
    args = (jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
            jnp.asarray(ang, jnp.float32), jnp.asarray(nv))
    Pd, qd, Ad, ld, ud = build_tension_qp(gm, *args, cfg)
    qp = build_tension_qp_blocks(gm, *args, cfg)
    Pb, qb, Ab, lb, ub = structured.to_dense(qp)

    M = len(x)
    # Interleaved index of dense var (channel c of point i) = 3 i + c.
    perm = np.concatenate([3 * np.arange(M) + c for c in range(3)])
    Pb, Ab = np.asarray(Pb), np.asarray(Ab)
    np.testing.assert_allclose(Pb[np.ix_(perm, perm)], np.asarray(Pd),
                               atol=1e-5)
    # Constraint rows are also per-point interleaved.
    np.testing.assert_allclose(Ab[np.ix_(perm, perm)], np.asarray(Ad),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(lb)[perm], np.asarray(ld), atol=0)
    np.testing.assert_allclose(np.asarray(ub)[perm], np.asarray(ud), atol=0)


def test_tension_structured_matches_dense_oracle():
    """Structured TENSION solve vs the f64 dense oracle. With the default
    cartesian_deviation_weight = 0 the optimum is weakly determined (any d
    pattern that keeps x, y affine is cost-free), so parity is asserted the
    meaningful way: the structured solution is feasible under the dense f64
    constraints and its cost matches a high-accuracy optimum."""
    x, y, ang, k, s, nv = _wavy_input()
    gm = _open_map()
    cfg = PlannerConfig()
    args = (jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
            jnp.asarray(ang, jnp.float32), jnp.asarray(nv))
    xo, yo, so, n2, conv = tension_smooth(gm, *args, cfg)
    assert bool(conv)

    P, q, A, l, u = [np.asarray(a, np.float64)
                     for a in build_tension_qp(gm, *args, cfg)]
    ref = oracle.solve(P, q, A, l, u, eps_abs=1e-8, eps_rel=1e-8,
                       max_iter=200000)
    assert ref.status == "solved"

    # Reconstruct the dense variable vector [x, y, d] from the solution;
    # d follows from the (equality) tie rows.
    M = len(x)
    xs = np.asarray(xo, np.float64)
    ys = np.asarray(yo, np.float64)
    theta = np.asarray(ang, np.float64) + np.pi / 2
    d = np.where(np.abs(np.cos(theta)) > 0.5,
                 (xs - x) / np.cos(theta), (ys - y) / np.sin(theta))
    v = np.concatenate([xs, ys, d])
    Ax = A @ v
    # OSQP-style scaled feasibility: eps_abs + eps_rel * |Ax|_inf (the x/y
    # tie rows carry ~30 m coordinates, so the solver's own 2e-3 relative
    # tolerance dominates).
    feas_tol = 2e-3 + 2e-3 * float(np.abs(Ax).max())
    assert float(np.maximum(l - Ax, Ax - u).max()) < feas_tol

    def cost(w):
        return 0.5 * w @ P @ w + q @ w
    gap = cost(v) - cost(ref.x)
    assert gap < max(1e-3, 5e-3 * abs(cost(ref.x)))


def test_segment_raw_reference_samples_at_1m():
    # Straight line of length 20.3 -> samples at 0..21 (one past the end).
    Mb = 64
    n = 40
    s_raw = np.linspace(0, 20.3, n)
    x_raw = s_raw.copy()
    y_raw = np.zeros(n)
    x_pad = np.concatenate([x_raw, x_raw[-1] + np.arange(1, Mb - n + 1)])
    y_pad = np.concatenate([y_raw, np.zeros(Mb - n)])
    s_pad = np.concatenate([s_raw, s_raw[-1] + np.arange(1, Mb - n + 1)])
    x, y, s, ang, k, nv = segment_raw_reference(
        jnp.asarray(x_pad, jnp.float32), jnp.asarray(y_pad, jnp.float32),
        jnp.asarray(s_pad, jnp.float32), jnp.asarray(n), 32)
    assert int(nv) == 22
    np.testing.assert_allclose(np.asarray(s)[:22], np.arange(22), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x)[:22], np.arange(22), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ang)[:22], 0.0, atol=1e-4)
