"""Post-smoothing QP in Frenet coordinates over the DP corridor.

Rebuilds ``postSmooth`` (reference:
src/reference_path_smoother/reference_path_smoother.cpp:526-636): variables
[l(L), l'(L), l''(L)] on the DP layers; diagonal cost (1 / 100 / 1000,
:587-589); constraints: l within the DP corridor with l_0 pinned to the
vehicle's lateral offset (:628-635), plus first-order integration chains
l_{i+1} - l_i = ds l'_i and l'_{i+1} - l'_i = ds l''_i (:613-624). The result
is re-projected to Cartesian and re-splined by the caller (:560-577).

The reference requires >= 4 layers and otherwise skips post-smoothing
(:528-531) — the caller mirrors that with an ``ok`` flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.qp import admm, structured


def build_post_qp(layers_s, lower, upper, vehicle_l, n_layers,
                  config: PlannerConfig):
    L = layers_s.shape[0]
    dt = layers_s.dtype
    idx = jnp.arange(L)
    nv = 3 * L
    nc = 3 * L - 2
    li, dli, ddli = 0, L, 2 * L

    pad = (idx >= n_layers).astype(dt)
    p_diag = jnp.concatenate([
        jnp.full((L,), config.post_weight_l, dt),
        jnp.full((L,), config.post_weight_dl, dt),
        jnp.full((L,), config.post_weight_ddl, dt) + pad,
    ])
    P = jnp.diag(p_diag)
    q = jnp.zeros((nv,), dt)

    ds = jnp.diff(layers_s)
    seg_valid = idx[:L - 1] <= n_layers - 2
    ds = jnp.where(seg_valid, jnp.where(ds > 1e-6, ds, 1.0), 0.0)

    A = jnp.zeros((nc, nv), dt)
    r = jnp.arange(L)
    # l range rows (:610-612).
    A = A.at[r, li + r].set(1.0)
    # dl-l chain (:614-618): l_{i+1} - l_i - ds l'_i = 0; padded segments
    # degenerate to pins of l'_{i+1}... but the reference's chain involves
    # l'_i, so padded rows instead pin l_{i+1} (coefficient kept) minus
    # nothing — we pin l'_{i} for padded rows to keep every var bounded.
    rr = jnp.arange(L - 1)
    cx = L + rr
    A = A.at[cx, li + rr + 1].set(jnp.where(seg_valid, 1.0, 0.0))
    A = A.at[cx, li + rr].set(jnp.where(seg_valid, -1.0, 0.0))
    A = A.at[cx, dli + rr].set(jnp.where(seg_valid, -ds, 1.0))
    # ddl-dl chain (:620-624).
    cy = L + (L - 1) + rr
    A = A.at[cy, dli + rr + 1].set(jnp.where(seg_valid, 1.0, 0.0))
    A = A.at[cy, dli + rr].set(jnp.where(seg_valid, -1.0, 0.0))
    A = A.at[cy, ddli + rr].set(jnp.where(seg_valid, -ds, 1.0))

    # Bounds (:628-635): l_0 pinned to vehicle_l; l_i in the DP corridor;
    # padded l rows pinned to 0; the last valid l' and l'' have no chain row —
    # cost keeps them bounded (reference leaves them similarly cost-only).
    l_lb = jnp.where(idx == 0, vehicle_l, lower)
    l_ub = jnp.where(idx == 0, vehicle_l, upper)
    is_pad = idx >= n_layers
    l_lb = jnp.where(is_pad, 0.0, l_lb)
    l_ub = jnp.where(is_pad, 0.0, l_ub)
    zeros = jnp.zeros((L - 1,), dt)
    lb = jnp.concatenate([l_lb, zeros, zeros])
    ub = jnp.concatenate([l_ub, zeros, zeros])
    return P, q, A, lb, ub


def post_smooth(layers_s, lower, upper, vehicle_l, n_layers,
                config: PlannerConfig,
                settings: admm.QPSettings = admm.QPSettings()):
    """Solve the post-smoothing QP. Returns (l (L,), ok, converged):
    l the smoothed lateral offsets on the DP layers; ok mirrors the
    reference's >= 4 layer requirement."""
    P, q, A, lb, ub = build_post_qp(layers_s, lower, upper, vehicle_l,
                                    n_layers, config)
    sol = admm.solve_qp(P, q, A, lb, ub, settings=settings)
    L = layers_s.shape[0]
    ok = n_layers >= 4
    return sol.x[:L], ok, sol.converged


def build_post_structured(layers_s, lower, upper, vehicle_l, n_layers,
                          config: PlannerConfig) -> structured.BlockBandedQP:
    """Block-banded form of the post-smoothing QP for the structured engine:
    variables per layer [l, l', l''] (nb=3); rows per layer (r=3) the
    corridor range plus the two integration chains attached to their later
    endpoint (reference reference_path_smoother.cpp:598-636). Identical
    problem to :func:`build_post_qp`."""
    L = layers_s.shape[0]
    dt = layers_s.dtype
    idx = jnp.arange(L)
    is_pad = (idx >= n_layers).astype(dt)

    p_diag = jax.vmap(jnp.diag)(jnp.stack([
        jnp.full((L,), config.post_weight_l, dt),
        jnp.full((L,), config.post_weight_dl, dt),
        jnp.full((L,), config.post_weight_ddl, dt) + is_pad,
    ], axis=-1))
    p_off = jnp.zeros((L, 3, 3), dt)
    q = jnp.zeros((L, 3), dt)

    # Chain data for group i comes from segment i-1.
    ds = jnp.diff(layers_s)
    seg_valid = idx[:L - 1] <= n_layers - 2
    ds = jnp.where(seg_valid, jnp.where(ds > 1e-6, ds, 1.0), 0.0)
    ds_g = jnp.concatenate([ds[:1], ds])
    valid_g = jnp.concatenate([jnp.zeros((1,), bool), seg_valid])
    group0 = idx == 0

    zeros = jnp.zeros((L,), dt)
    ones = jnp.ones((L,), dt)
    # Row 0: l_i corridor range (pin at group 0 / padding).
    r0_cur = jnp.stack([ones, zeros, zeros], -1)
    # Row 1: l chain (valid) or l'_{i-1} pin (invalid, matching the dense
    # builder's degenerate rows); null at group 0.
    r1_cur = jnp.where(valid_g[:, None],
                       jnp.stack([ones, zeros, zeros], -1), 0.0)
    r1_prev = jnp.where(valid_g[:, None],
                        jnp.stack([-ones, -ds_g, zeros], -1),
                        jnp.stack([zeros, ones, zeros], -1))
    # Row 2: l' chain or l''_{i-1} pin; null at group 0.
    r2_cur = jnp.where(valid_g[:, None],
                       jnp.stack([zeros, ones, zeros], -1), 0.0)
    r2_prev = jnp.where(valid_g[:, None],
                        jnp.stack([zeros, -ones, -ds_g], -1),
                        jnp.stack([zeros, zeros, ones], -1))
    a_cur = jnp.stack([r0_cur, r1_cur, r2_cur], axis=-2)
    a_prev = jnp.stack([jnp.zeros((L, 3), dt), r1_prev, r2_prev], axis=-2)
    a_prev = jnp.where(group0[:, None, None], 0.0, a_prev)

    l_lb = jnp.where(group0, vehicle_l, lower)
    l_ub = jnp.where(group0, vehicle_l, upper)
    l_lb = jnp.where(is_pad > 0, 0.0, l_lb)
    l_ub = jnp.where(is_pad > 0, 0.0, l_ub)
    lb = jnp.stack([l_lb, zeros, zeros], axis=-1)
    ub = jnp.stack([l_ub, zeros, zeros], axis=-1)
    return structured.BlockBandedQP(p_diag=p_diag, p_off=p_off, q=q,
                                    a_cur=a_cur, a_prev=a_prev, lb=lb, ub=ub)


def post_smooth_batched(layers_s, lower, upper, vehicle_l, n_layers,
                        config: PlannerConfig,
                        settings: admm.QPSettings = admm.QPSettings()):
    """Batched variant (leading B axis): vmapped block-banded assembly +
    the structured fused-kernel ADMM engine."""
    qp = jax.vmap(
        lambda a, b, c, d, e: build_post_structured(a, b, c, d, e, config)
    )(layers_s, lower, upper, vehicle_l, n_layers)
    sol = structured.solve_structured_batched(qp, settings=settings)
    ok = n_layers >= 4
    return sol.v[:, :, 0], ok, sol.converged
