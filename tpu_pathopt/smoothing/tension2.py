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
from tpu_pathopt.qp import admm, structured


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


def build_tension2_structured(x_in, y_in, angle_in, k_in, s_in, n_valid,
                              config: PlannerConfig) -> structured.BlockBandedQP:
    """Block-banded form of the TENSION2 QP for the structured engine:
    variables per point [x, y, theta, k] (nb=4), rows per point the three
    linearized transitions attached to their later endpoint (r=3), with the
    two start pins folded into group 0 (reference tension_smoother_2.cpp:
    96-145). Identical problem to :func:`build_tension2_qp` up to a dummy
    decoupled k_{M-1} variable (regularized to 0)."""
    M = x_in.shape[0]
    dt = x_in.dtype
    idx = jnp.arange(M)
    w_dev = config.tension_2_deviation_weight
    w_k = config.tension_2_curvature_weight
    w_kr = config.tension_2_curvature_rate_weight

    # pair_i (i in [0, M-3]): both k_i and k_{i+1} live on valid points.
    pair = ((idx <= n_valid - 3) & (idx < M - 2)).astype(dt)      # (M,)
    pair_im1 = jnp.concatenate([jnp.zeros((1,), dt), pair[:-1]])
    is_pad = (idx >= n_valid).astype(dt)
    has_k = (idx < M - 1).astype(dt)

    k_diag = (2.0 * w_k * has_k + 2.0 * w_kr * (pair + pair_im1)
              + is_pad * has_k + (1.0 - has_k))
    p_diag = jax.vmap(jnp.diag)(jnp.stack([
        jnp.full((M,), 2.0 * w_dev, dt),
        jnp.full((M,), 2.0 * w_dev, dt),
        is_pad,
        k_diag,
    ], axis=-1))
    p_off = jnp.zeros((M, 4, 4), dt)
    p_off = p_off.at[:, 3, 3].set(-2.0 * w_kr * pair_im1)

    q = jnp.stack([-2.0 * w_dev * x_in, -2.0 * w_dev * y_in,
                   jnp.zeros((M,), dt), jnp.zeros((M,), dt)], axis=-1)

    # Transition data for group i (i >= 1) comes from segment i-1.
    ds = jnp.diff(s_in)
    ds = jnp.where(ds > 1e-6, ds, 1.0)
    ds = jnp.concatenate([ds[:1], ds])                 # align to groups
    th = jnp.concatenate([angle_in[:1], angle_in[:-1]])
    kb = jnp.concatenate([k_in[:1], k_in[:-1]])
    sin_a, cos_a = jnp.sin(th), jnp.cos(th)
    # Group i valid iff segment i-1 is inside the valid range.
    valid = ((idx >= 1) & (idx <= n_valid - 1)).astype(dt)

    eye3x4 = jnp.concatenate([jnp.eye(3, dtype=dt),
                              jnp.zeros((3, 1), dt)], axis=1)
    a_cur = jnp.broadcast_to(eye3x4, (M, 3, 4)).copy()
    # Group 0: pins x_0, y_0 only.
    a_cur = a_cur.at[0, 2].set(0.0)
    ap = jnp.stack([
        jnp.stack([-jnp.ones((M,), dt), jnp.zeros((M,), dt),
                   ds * sin_a, jnp.zeros((M,), dt)], -1),
        jnp.stack([jnp.zeros((M,), dt), -jnp.ones((M,), dt),
                   -ds * cos_a, jnp.zeros((M,), dt)], -1),
        jnp.stack([jnp.zeros((M,), dt), jnp.zeros((M,), dt),
                   -jnp.ones((M,), dt), -ds], -1),
    ], axis=-2)                                        # (M, 3, 4)
    a_prev = jnp.where(valid[:, None, None], ap, 0.0)

    b_valid = jnp.stack([ds * cos_a, ds * sin_a, -ds * kb], -1)   # (M, 3)
    b_pad = jnp.stack([x_in, y_in, jnp.zeros((M,), dt)], -1)
    b = jnp.where(valid[:, None], b_valid, b_pad)
    b = b.at[0].set(jnp.stack([x_in[0], y_in[0], jnp.asarray(0.0, dt)]))

    return structured.BlockBandedQP(p_diag=p_diag, p_off=p_off, q=q,
                                    a_cur=a_cur, a_prev=a_prev, lb=b, ub=b)


def tension2_smooth_batched(x_in, y_in, angle_in, k_in, s_in, n_valid,
                            config: PlannerConfig,
                            settings: admm.QPSettings = admm.QPSettings()):
    """Batched variant (leading B axis on every input): vmapped block-banded
    assembly + the structured fused-kernel ADMM engine."""
    qp = jax.vmap(
        lambda a, b, c, d, e, f: build_tension2_structured(a, b, c, d, e, f,
                                                           config)
    )(x_in, y_in, angle_in, k_in, s_in, n_valid)
    sol = structured.solve_structured_batched(qp, settings=settings)
    x = sol.v[:, :, 0]
    y = sol.v[:, :, 1]
    M = x_in.shape[1]
    seg = jnp.hypot(jnp.diff(x, axis=-1), jnp.diff(y, axis=-1))
    seg = jnp.where(jnp.arange(M - 1)[None] <= n_valid[:, None] - 2, seg, 0.0)
    s = jnp.concatenate(
        [jnp.zeros((x.shape[0], 1), x.dtype), jnp.cumsum(seg, axis=-1)], -1)
    return x, y, s, n_valid, sol.converged
