"""TENSION smoothing QP (the reference's alternative smoother).

Rebuilds TensionSmoother (reference:
src/reference_path_smoother/tension_smoother.cpp): variables [x(M), y(M), d(M)]
where d is the lateral offset along the input-path normal; cost = 2nd/3rd
finite differences of x and y (curvature / curvature-rate proxies, :102-126)
plus d deviation; constraints tie (x, y) to d along the normal (:143-156),
|d| is bounded by grid-map clearance clamped to 2 m (:163-176), d_0 = 0 and
d_{M-1} in [-0.5, 0.5] (:159-162).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_pathopt import maps
from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.qp import admm


def build_tension_qp(gm: maps.GridMap, x_in, y_in, angle_in, n_valid,
                     config: PlannerConfig):
    M = x_in.shape[0]
    dt = x_in.dtype
    idx = jnp.arange(M)
    w_c = config.cartesian_curvature_weight
    w_cr = config.cartesian_curvature_rate_weight
    w_d = config.cartesian_deviation_weight

    nv = 3 * M
    nc = 3 * M
    xi, yi, di = 0, M, 2 * M

    # --- Hessian: sum over valid windows of (2nd diff)^2 and (3rd diff)^2
    # outer products (tension_smoother.cpp:108-120) ---
    P = jnp.zeros((nv, nv), dt)
    dds = jnp.asarray([1.0, -2.0, 1.0], dt)
    ddds = jnp.asarray([-1.0, 3.0, -3.0, 1.0], dt)
    dds_blk = w_c * jnp.outer(dds, dds)
    ddds_blk = w_cr * jnp.outer(ddds, ddds)
    w2 = (idx[:M - 2] <= n_valid - 3).astype(dt)    # windows of 3 valid pts
    w3 = (idx[:M - 3] <= n_valid - 4).astype(dt)    # windows of 4 valid pts
    for base in (xi, yi):
        for o1 in range(3):
            for o2 in range(3):
                P = P.at[base + idx[:M - 2] + o1, base + idx[:M - 2] + o2].add(
                    w2 * dds_blk[o1, o2])
        for o1 in range(4):
            for o2 in range(4):
                P = P.at[base + idx[:M - 3] + o1, base + idx[:M - 3] + o2].add(
                    w3 * ddds_blk[o1, o2])
    # Deviation part on d (:121-124) + padding regularization on all vars.
    pad = (idx >= n_valid).astype(dt)
    diag = jnp.concatenate([pad, pad, jnp.full((M,), w_d, dt) + pad])
    P = P + jnp.diag(diag)

    q = jnp.zeros((nv,), dt)

    # --- Constraints (:128-176) ---
    A = jnp.zeros((nc, nv), dt)
    theta = angle_in + jnp.pi / 2
    A = A.at[idx, xi + idx].set(1.0)
    A = A.at[idx, di + idx].set(-jnp.cos(theta))
    A = A.at[M + idx, yi + idx].set(1.0)
    A = A.at[M + idx, di + idx].set(-jnp.sin(theta))
    A = A.at[2 * M + idx, di + idx].set(1.0)

    # Bounds: x/y rows equal the input points; d bounds from the ESDF.
    clear = maps.obstacle_distance(gm, x_in, y_in)
    clear = jnp.minimum(clear, 2.0)
    d_lb = -clear
    d_ub = clear
    d_lb = d_lb.at[0].set(0.0)
    d_ub = d_ub.at[0].set(0.0)
    # Last *valid* point: [-0.5, 0.5]; padded points pinned to 0.
    is_last = idx == (n_valid - 1)
    d_lb = jnp.where(is_last, -0.5, d_lb)
    d_ub = jnp.where(is_last, 0.5, d_ub)
    is_pad = idx >= n_valid
    d_lb = jnp.where(is_pad, 0.0, d_lb)
    d_ub = jnp.where(is_pad, 0.0, d_ub)

    l = jnp.concatenate([x_in, y_in, d_lb])
    u = jnp.concatenate([x_in, y_in, d_ub])
    return P, q, A, l, u


def tension_smooth(gm: maps.GridMap, x_in, y_in, angle_in, n_valid,
                   config: PlannerConfig,
                   settings: admm.QPSettings = admm.QPSettings()):
    """Solve the TENSION QP; returns (x, y, s, n_valid, converged)."""
    M = x_in.shape[0]
    P, q, A, l, u = build_tension_qp(gm, x_in, y_in, angle_in, n_valid, config)
    sol = admm.solve_qp(P, q, A, l, u, settings=settings)
    x = sol.x[:M]
    y = sol.x[M:2 * M]
    seg = jnp.hypot(jnp.diff(x), jnp.diff(y))
    seg = jnp.where(jnp.arange(M - 1) <= n_valid - 2, seg, 0.0)
    s = jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(seg)])
    return x, y, s, n_valid, sol.converged


def tension_smooth_batched(gm: maps.GridMap, x_in, y_in, angle_in, n_valid,
                           config: PlannerConfig,
                           settings: admm.QPSettings = admm.QPSettings()):
    """Batched variant (leading B axis; one shared grid map): vmapped assembly
    + natively batched ADMM solve."""
    M = x_in.shape[1]
    P, q, A, l, u = jax.vmap(
        lambda a, b, c, d: build_tension_qp(gm, a, b, c, d, config)
    )(x_in, y_in, angle_in, n_valid)
    sol = admm.solve_qp_batched(P, q, A, l, u, settings=settings)
    x = sol.x[:, :M]
    y = sol.x[:, M:2 * M]
    seg = jnp.hypot(jnp.diff(x, axis=-1), jnp.diff(y, axis=-1))
    seg = jnp.where(jnp.arange(M - 1)[None] <= n_valid[:, None] - 2, seg, 0.0)
    s = jnp.concatenate(
        [jnp.zeros((x.shape[0], 1), x.dtype), jnp.cumsum(seg, axis=-1)], -1)
    return x, y, s, n_valid, sol.converged
