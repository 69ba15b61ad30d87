"""TENSION smoothing QP (the reference's alternative smoother).

Rebuilds TensionSmoother (reference:
src/reference_path_smoother/tension_smoother.cpp): variables [x, y, d] per
point where d is the lateral offset along the input-path normal; cost = 2nd/3rd
finite differences of x and y (curvature / curvature-rate proxies, :102-126)
plus d deviation; constraints tie (x, y) to d along the normal (:143-156),
|d| is bounded by grid-map clearance clamped to 2 m (:163-176), d_0 = 0 and
d_{M-1} in [-0.5, 0.5] (:159-162).

TPU formulation: the 3rd-difference stencil couples a point to at most three
predecessors, so grouping points in TRIPLES makes the Hessian block-
tridiagonal in 9-variable blocks ([x, y, d] x 3 points) — exactly the shape
of the structured engine (``qp.structured``), whose fused Pallas kernels then
run the whole solve with the scenario batch on the vector lanes. No dense
(3M)^2 matrix is ever built on the hot path; the dense builder below survives
only as the oracle-parity reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_pathopt import maps
from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.qp import admm, structured

_GRP = 3    # points per block: covers the 3rd-difference reach
_NB = 9     # variables per block ([x, y, d] x 3)


def _d_bounds(gm: maps.GridMap, x_in, y_in, n_valid):
    """Per-point d bounds (tension_smoother.cpp:159-176): ESDF clearance
    clamped to 2 m; d_0 = 0; last valid point in [-0.5, 0.5]; padding
    pinned to 0."""
    M = x_in.shape[0]
    idx = jnp.arange(M)
    clear = jnp.minimum(maps.obstacle_distance(gm, x_in, y_in), 2.0)
    d_lb, d_ub = -clear, clear
    d_lb = d_lb.at[0].set(0.0)
    d_ub = d_ub.at[0].set(0.0)
    is_last = idx == (n_valid - 1)
    d_lb = jnp.where(is_last, -0.5, d_lb)
    d_ub = jnp.where(is_last, 0.5, d_ub)
    is_pad = idx >= n_valid
    d_lb = jnp.where(is_pad, 0.0, d_lb)
    d_ub = jnp.where(is_pad, 0.0, d_ub)
    return d_lb, d_ub


def _xy_band(M: int, n_valid, config: PlannerConfig, dt):
    """Lower band (M, 4) of the shared x/y difference Hessian:
    band[i, o] = H[i, i - o], summed over valid 2nd-diff (3-point) and
    3rd-diff (4-point) windows (tension_smoother.cpp:108-120)."""
    dds = jnp.asarray([1.0, -2.0, 1.0], dt)
    ddds = jnp.asarray([-1.0, 3.0, -3.0, 1.0], dt)
    blk2 = config.cartesian_curvature_weight * jnp.outer(dds, dds)
    blk3 = config.cartesian_curvature_rate_weight * jnp.outer(ddds, ddds)
    t2 = jnp.arange(M - 2)
    t3 = jnp.arange(M - 3)
    w2 = (t2 <= n_valid - 3).astype(dt)
    w3 = (t3 <= n_valid - 4).astype(dt)
    band = jnp.zeros((M, 4), dt)
    for o1 in range(3):
        for o2 in range(o1 + 1):
            band = band.at[t2 + o1, o1 - o2].add(w2 * blk2[o1, o2])
    for o1 in range(4):
        for o2 in range(o1 + 1):
            band = band.at[t3 + o1, o1 - o2].add(w3 * blk3[o1, o2])
    return band


def build_tension_qp_blocks(gm: maps.GridMap, x_in, y_in, angle_in, n_valid,
                            config: PlannerConfig) -> structured.BlockBandedQP:
    """Assemble the TENSION QP as a block-banded problem (3-point groups).

    Variable v within group g: index 3*l + c with l the local point
    (0..2, global point i = 3g + l) and c the channel (0 = x, 1 = y, 2 = d).
    The x-x / y-y couplings reach at most 3 points back, so they land in
    p_diag / p_off only; constraint rows touch a single point each
    (a_prev = 0).
    """
    M = x_in.shape[0]
    dt = x_in.dtype
    G = -(-M // _GRP)
    Mp = G * _GRP
    if Mp != M:
        def pad(a):
            return jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (Mp - M,))])
        x_in, y_in, angle_in = pad(x_in), pad(y_in), pad(angle_in)

    idx = jnp.arange(Mp)
    band = _xy_band(Mp, n_valid, config, dt)

    # --- Hessian blocks ---
    # Same-channel x/y entries: H[i, j] = band[max(i,j), |i-j|].
    l1 = jnp.arange(_GRP)[:, None]          # (3, 1) local row point
    l2 = jnp.arange(_GRP)[None, :]          # (1, 3) local col point
    gpt = idx.reshape(G, _GRP)              # (G, 3) global point index

    # p_diag: points i = 3g+l1, j = 3g+l2 -> offset |l1-l2| at row max(l1,l2).
    row_pt = jnp.maximum(gpt[:, :, None], gpt[:, None, :])     # (G, 3, 3)
    off_d = jnp.abs(l1 - l2)[None]                             # (1, 3, 3)
    xy_diag = band[row_pt, jnp.broadcast_to(off_d, row_pt.shape)]  # (G, 3, 3)

    pad_reg = (idx >= n_valid).astype(dt).reshape(G, _GRP)
    w_d = config.cartesian_deviation_weight

    p_diag = jnp.zeros((G, _NB, _NB), dt)
    for c in range(2):                       # x and y channels share the band
        p_diag = p_diag.at[:, 3 * l1 + c, 3 * l2 + c].set(xy_diag)
    # Padding regularization on x/y diag; d diag = w_d + padding reg.
    for l in range(_GRP):
        for c in range(2):
            p_diag = p_diag.at[:, 3 * l + c, 3 * l + c].add(pad_reg[:, l])
        p_diag = p_diag.at[:, 3 * l + 2, 3 * l + 2].add(w_d + pad_reg[:, l])

    # p_off: i = 3g+l1 in group g, j = 3(g-1)+l2 -> offset 3 + l1 - l2
    # (nonzero only when <= 3, i.e. l1 <= l2).
    off_o = 3 + l1 - l2                                        # (3, 3)
    valid_o = off_o <= 3
    off_o_c = jnp.where(valid_o, off_o, 0)
    xy_off = jnp.where(valid_o[None],
                       band[gpt[:, :, None],
                            jnp.broadcast_to(off_o_c[None], (G, 3, 3))],
                       0.0)                                    # (G, 3, 3)
    p_off = jnp.zeros((G, _NB, _NB), dt)
    for c in range(2):
        p_off = p_off.at[:, 3 * l1 + c, 3 * l2 + c].set(xy_off)
    p_off = p_off.at[0].set(0.0)

    # --- Constraints: 3 rows per point, current block only ---
    theta = angle_in + jnp.pi / 2
    ct, st = jnp.cos(theta).reshape(G, _GRP), jnp.sin(theta).reshape(G, _GRP)
    a_cur = jnp.zeros((G, _NB, _NB), dt)
    for l in range(_GRP):
        a_cur = a_cur.at[:, 3 * l + 0, 3 * l + 0].set(1.0)
        a_cur = a_cur.at[:, 3 * l + 0, 3 * l + 2].set(-ct[:, l])
        a_cur = a_cur.at[:, 3 * l + 1, 3 * l + 1].set(1.0)
        a_cur = a_cur.at[:, 3 * l + 1, 3 * l + 2].set(-st[:, l])
        a_cur = a_cur.at[:, 3 * l + 2, 3 * l + 2].set(1.0)
    a_prev = jnp.zeros((G, _NB, _NB), dt)

    d_lb, d_ub = _d_bounds(gm, x_in, y_in, n_valid)
    lb = jnp.stack([x_in, y_in, d_lb], axis=-1).reshape(G, _NB)
    ub = jnp.stack([x_in, y_in, d_ub], axis=-1).reshape(G, _NB)

    return structured.BlockBandedQP(
        p_diag=p_diag, p_off=p_off, q=jnp.zeros((G, _NB), dt),
        a_cur=a_cur, a_prev=a_prev, lb=lb, ub=ub)


def build_tension_qp(gm: maps.GridMap, x_in, y_in, angle_in, n_valid,
                     config: PlannerConfig):
    """Dense (P, q, A, l, u) with variables [x(M), y(M), d(M)] — kept as the
    oracle-parity reference for the block-banded assembly above (the hot path
    never materializes it)."""
    M = x_in.shape[0]
    dt = x_in.dtype
    idx = jnp.arange(M)
    w_c = config.cartesian_curvature_weight
    w_cr = config.cartesian_curvature_rate_weight
    w_d = config.cartesian_deviation_weight

    nv = 3 * M
    nc = 3 * M
    xi, yi, di = 0, M, 2 * M

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
    pad = (idx >= n_valid).astype(dt)
    diag = jnp.concatenate([pad, pad, jnp.full((M,), w_d, dt) + pad])
    P = P + jnp.diag(diag)

    q = jnp.zeros((nv,), dt)

    A = jnp.zeros((nc, nv), dt)
    theta = angle_in + jnp.pi / 2
    A = A.at[idx, xi + idx].set(1.0)
    A = A.at[idx, di + idx].set(-jnp.cos(theta))
    A = A.at[M + idx, yi + idx].set(1.0)
    A = A.at[M + idx, di + idx].set(-jnp.sin(theta))
    A = A.at[2 * M + idx, di + idx].set(1.0)

    d_lb, d_ub = _d_bounds(gm, x_in, y_in, n_valid)
    l = jnp.concatenate([x_in, y_in, d_lb])
    u = jnp.concatenate([x_in, y_in, d_ub])
    return P, q, A, l, u


def _unpack(v, M):
    """(…, G, 9) block solution -> x, y arrays of length M."""
    pts = v.reshape(v.shape[:-2] + (-1, 3))     # (..., Mp, [x, y, d])
    return pts[..., :M, 0], pts[..., :M, 1]


def tension_smooth(gm: maps.GridMap, x_in, y_in, angle_in, n_valid,
                   config: PlannerConfig,
                   settings: admm.QPSettings = admm.QPSettings()):
    """Solve the TENSION QP; returns (x, y, s, n_valid, converged)."""
    x, y, s, nv, conv = tension_smooth_batched(
        gm, x_in[None], y_in[None], angle_in[None], n_valid[None],
        config, settings)
    return x[0], y[0], s[0], nv[0], conv[0]


def tension_smooth_batched(gm: maps.GridMap, x_in, y_in, angle_in, n_valid,
                           config: PlannerConfig,
                           settings: admm.QPSettings = admm.QPSettings()):
    """Batched variant (leading B axis; one shared grid map): vmapped
    block-banded assembly + the structured fused-kernel solver."""
    M = x_in.shape[1]
    qp = jax.vmap(
        lambda a, b, c, d: build_tension_qp_blocks(gm, a, b, c, d, config)
    )(x_in, y_in, angle_in, n_valid)
    sol = structured.solve_structured_batched(qp, settings=settings)
    x, y = _unpack(sol.v, M)
    seg = jnp.hypot(jnp.diff(x, axis=-1), jnp.diff(y, axis=-1))
    seg = jnp.where(jnp.arange(M - 1)[None] <= n_valid[:, None] - 2, seg, 0.0)
    s = jnp.concatenate(
        [jnp.zeros((x.shape[0], 1), x.dtype), jnp.cumsum(seg, axis=-1)], -1)
    return x, y, s, n_valid, sol.converged
