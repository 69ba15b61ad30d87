"""TENSION2 smoothing QP (the reference's default smoother).

Rebuilds the kinematic smoothing QP of TensionSmoother2 (reference:
src/reference_path_smoother/tension_smoother_2.cpp): variables
[x(M), y(M), theta(M), k(M-1)] where theta is the *heading deviation* from the
input path; cost = deviation from the input x, y (:80-93 and gradient
:147-158) + k^2 + (delta k)^2; equality constraints are the linearized
unicycle transition
    x_{i+1} - x_i + ds sin(th_bar_i) theta_i = ds cos(th_bar_i)
    y_{i+1} - y_i - ds cos(th_bar_i) theta_i = ds sin(th_bar_i)
    theta_{i+1} - theta_i - ds k_i = -ds k_bar_i
(:119-129) plus the pinned start point (:130, 143-144). There are no obstacle
constraints — collision avoidance is delegated to the DP search + postSmooth.

Assembled as masked dense (P, q, A, l, u) and solved with the batched dense
ADMM; padded points are pinned to their (held-last) input values so the padded
problem equals the unpadded one on valid points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.qp import admm


def build_tension2_qp(x_in, y_in, angle_in, k_in, s_in, n_valid,
                      config: PlannerConfig):
    """Returns dense (P, q, A, l, u). M = static point count."""
    M = x_in.shape[0]
    dt = x_in.dtype
    idx = jnp.arange(M)
    w_dev = config.tension_2_deviation_weight
    w_k = config.tension_2_curvature_weight
    w_kr = config.tension_2_curvature_rate_weight

    nv = 4 * M - 1
    nc = 3 * (M - 1) + 2
    xi, yi, ti, ki = 0, M, 2 * M, 3 * M

    # --- Hessian (tension_smoother_2.cpp:74-94) ---
    p_diag = jnp.zeros((nv,), dt)
    p_diag = p_diag.at[xi:xi + M].set(2.0 * w_dev)
    p_diag = p_diag.at[yi:yi + M].set(2.0 * w_dev)
    p_diag = p_diag.at[ki:ki + M - 1].set(2.0 * w_k)
    P = jnp.diag(p_diag)
    # Curvature-change coupling on valid k pairs (i, i+1), i <= n_valid-3.
    pair_valid = (idx[:M - 2] <= n_valid - 3).astype(dt)
    kk = jnp.zeros((M - 1,), dt)
    kk = kk.at[:M - 2].add(2.0 * w_kr * pair_valid)       # k_i^2 terms
    kk = kk.at[1:].add(2.0 * w_kr * pair_valid)           # k_{i+1}^2 terms
    P = P + jnp.diag(jnp.concatenate([jnp.zeros((3 * M,), dt), kk]))
    off = -2.0 * w_kr * pair_valid                         # cross terms
    P = P.at[ki + idx[:M - 2], ki + idx[:M - 2] + 1].add(off)
    P = P.at[ki + idx[:M - 2] + 1, ki + idx[:M - 2]].add(off)

    # Pin padded theta/k with unit cost for conditioning (their rows pin
    # x/y; theta/k have no rows beyond the valid range).
    pad_pt = (idx >= n_valid).astype(dt)
    P = P + jnp.diag(jnp.concatenate(
        [jnp.zeros((2 * M,), dt), pad_pt, pad_pt[:M - 1]]))

    # --- Gradient (:147-158) ---
    q = jnp.zeros((nv,), dt)
    q = q.at[xi:xi + M].set(-2.0 * w_dev * x_in)
    q = q.at[yi:yi + M].set(-2.0 * w_dev * y_in)

    # --- Constraints (:96-145) ---
    ds = jnp.diff(s_in)
    ds = jnp.where(ds > 1e-6, ds, 1.0)
    seg_valid = idx[:M - 1] <= n_valid - 2                 # transition i valid
    sin_a = jnp.sin(angle_in[:M - 1])
    cos_a = jnp.cos(angle_in[:M - 1])

    A = jnp.zeros((nc, nv), dt)
    r = jnp.arange(M - 1)
    # x rows.
    A = A.at[r, xi + r + 1].set(1.0)
    A = A.at[r, xi + r].set(jnp.where(seg_valid, -1.0, 0.0))
    A = A.at[r, ti + r].set(jnp.where(seg_valid, ds * sin_a, 0.0))
    # y rows.
    yr = (M - 1) + r
    A = A.at[yr, yi + r + 1].set(1.0)
    A = A.at[yr, yi + r].set(jnp.where(seg_valid, -1.0, 0.0))
    A = A.at[yr, ti + r].set(jnp.where(seg_valid, -ds * cos_a, 0.0))
    # theta rows.
    tr = 2 * (M - 1) + r
    A = A.at[tr, ti + r + 1].set(1.0)
    A = A.at[tr, ti + r].set(jnp.where(seg_valid, -1.0, 0.0))
    A = A.at[tr, ki + r].set(jnp.where(seg_valid, -ds, 0.0))
    # Start pins.
    A = A.at[nc - 2, xi].set(1.0)
    A = A.at[nc - 1, yi].set(1.0)

    # Bounds: equalities. Padded transition rows degenerate to pins of point
    # i+1 at its (held-last) input value / zero deviation.
    bx = jnp.where(seg_valid, ds * cos_a, x_in[1:])
    by = jnp.where(seg_valid, ds * sin_a, y_in[1:])
    bt = jnp.where(seg_valid, -ds * k_in[:M - 1], 0.0)
    b = jnp.concatenate([bx, by, bt, x_in[:1], y_in[:1]])
    return P, q, A, b, b


def tension2_smooth(x_in, y_in, angle_in, k_in, s_in, n_valid,
                    config: PlannerConfig,
                    settings: admm.QPSettings = admm.QPSettings()):
    """Solve the TENSION2 QP; returns (x, y, s, n_valid, converged) with s the
    rebuilt cumulative arc length (tension_smoother_2.cpp:56-71)."""
    M = x_in.shape[0]
    P, q, A, l, u = build_tension2_qp(x_in, y_in, angle_in, k_in, s_in,
                                      n_valid, config)
    sol = admm.solve_qp(P, q, A, l, u, settings=settings)
    x = sol.x[:M]
    y = sol.x[M:2 * M]
    seg = jnp.hypot(jnp.diff(x), jnp.diff(y))
    seg = jnp.where(jnp.arange(M - 1) <= n_valid - 2, seg, 0.0)
    s = jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(seg)])
    return x, y, s, n_valid, sol.converged


def tension2_smooth_batched(x_in, y_in, angle_in, k_in, s_in, n_valid,
                            config: PlannerConfig,
                            settings: admm.QPSettings = admm.QPSettings()):
    """Batched variant (leading B axis on every input): assembly is vmapped,
    the solve goes through the natively batched ADMM (shared factorization
    control flow — much faster than vmapping :func:`tension2_smooth`)."""
    M = x_in.shape[1]
    P, q, A, l, u = jax.vmap(
        lambda a, b, c, d, e, f: build_tension2_qp(a, b, c, d, e, f, config)
    )(x_in, y_in, angle_in, k_in, s_in, n_valid)
    sol = admm.solve_qp_batched(P, q, A, l, u, settings=settings)
    x = sol.x[:, :M]
    y = sol.x[:, M:2 * M]
    seg = jnp.hypot(jnp.diff(x, axis=-1), jnp.diff(y, axis=-1))
    seg = jnp.where(jnp.arange(M - 1)[None] <= n_valid[:, None] - 2, seg, 0.0)
    s = jnp.concatenate(
        [jnp.zeros((x.shape[0], 1), x.dtype), jnp.cumsum(seg, axis=-1)], -1)
    return x, y, s, n_valid, sol.converged
