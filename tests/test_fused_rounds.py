"""Parity of the fused Pallas ADMM-round / factor kernels vs the XLA rounds.

Runs the kernels in Pallas interpret mode on CPU (the solver itself falls back
to XLA rounds off-TPU; these tests call the kernels directly)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.qp.admm import QPSettings
from tpu_pathopt.qp import btridiag
from tpu_pathopt.solver import assembly, fused_rounds
from tpu_pathopt.solver.assembly import assemble_path_qp


def _chicane_qps(cfg, shifts):
    N = cfg.n_knots
    s = jnp.arange(N, dtype=jnp.float32) * 0.3
    k = jnp.zeros(N)

    def mk(shift):
        c = jnp.where((s > 3.0) & (s < 6.0), shift, 0.0)
        lb, ub = c - 1.2, c + 1.2
        return assemble_path_qp(
            ref_s=s, ref_k=k, ref_heading_last=0.0,
            input_l=jnp.zeros(N), input_e=jnp.zeros(N), input_k=k,
            front_lb=lb, front_ub=ub, rear_lb=lb, rear_ub=ub,
            init_offset=0.0, init_heading_error=0.0, start_k=0.0,
            target_heading=0.0, blocked=False, n_valid=N, config=cfg)

    return jax.vmap(mk)(jnp.asarray(shifts, jnp.float32))


def _factors(qp, st):
    B, N = qp.p_diag.shape[:2]
    cls_knot, cls_end = jax.vmap(assembly.rho_classes)(qp)
    rho_bar = jnp.full((B,), st.rho_bar, jnp.float32)
    rk = rho_bar[:, None, None] * cls_knot
    re = rho_bar[:, None] * cls_end
    diag, off = jax.vmap(assembly.normal_blocks, in_axes=(0, 0, 0, None))(
        qp, rk, re, st.sigma)
    return rk, re, diag, off


def test_fused_factor_matches_btridiag():
    cfg = PlannerConfig(n_knots=24)
    st = QPSettings()
    qp = _chicane_qps(cfg, [0.8, -0.5])
    rk, re, diag, off = _factors(qp, st)
    B, N = qp.p_diag.shape[:2]

    C, W = jax.vmap(btridiag.factor)(diag, off)
    Ci_ref, W_ref = btridiag.inv_factors(C, W)

    lane = lambda a: jnp.moveaxis(a, 0, -1)
    offp = jnp.concatenate([jnp.zeros((B, 1, 6, 6), jnp.float32), off], 1)
    Ci_l, Wp_l = fused_rounds.fused_factor(lane(diag), lane(offp),
                                           interpret=True)
    Ci_k = jnp.moveaxis(Ci_l, -1, 0)
    Wp_k = jnp.moveaxis(Wp_l, -1, 0)
    np.testing.assert_allclose(np.asarray(Ci_k), np.asarray(Ci_ref),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(Wp_k[:, 1:]), np.asarray(W_ref),
                               atol=2e-4, rtol=2e-3)


def test_fused_factor_non_multiple_batch():
    """A batch that is neither <= 128 nor a 128-multiple must still go
    through the kernels (lane padding), with results identical to the
    per-element factorization on the real lanes."""
    cfg = PlannerConfig(n_knots=6)
    st = QPSettings()
    B = 130
    rng = np.random.default_rng(3)
    qp = _chicane_qps(cfg, rng.uniform(-0.8, 0.8, size=B))
    rk, re, diag, off = _factors(qp, st)

    C, W = jax.vmap(btridiag.factor)(diag, off)
    Ci_ref, W_ref = btridiag.inv_factors(C, W)

    lane = lambda a: jnp.moveaxis(a, 0, -1)
    offp = jnp.concatenate([jnp.zeros((B, 1, 6, 6), jnp.float32), off], 1)
    Ci_l, Wp_l = fused_rounds.fused_factor(lane(diag), lane(offp),
                                           interpret=True)
    assert Ci_l.shape[-1] == B and Wp_l.shape[-1] == B
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(Ci_l, -1, 0)),
                               np.asarray(Ci_ref), atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(Wp_l, -1, 0)[:, 1:]),
                               np.asarray(W_ref), atol=2e-4, rtol=2e-3)


def test_fused_round_non_multiple_batch():
    """One fused ADMM round at B=130 (two padded lane chunks) matches the
    XLA round on every real lane."""
    cfg = PlannerConfig(n_knots=6)
    st = QPSettings()
    B = 130
    rng = np.random.default_rng(4)
    qp = _chicane_qps(cfg, rng.uniform(-0.8, 0.8, size=B))
    N = cfg.n_knots
    dt = jnp.float32

    rk, re, diag, off = _factors(qp, st)
    C, W = jax.vmap(btridiag.factor)(diag, off)
    Ci, W = btridiag.inv_factors(C, W)
    lb_knot, ub_knot, lb_end, ub_end = jax.vmap(assembly.bounds)(qp)

    v = jnp.zeros((B, N, 6), dt)
    zk, ze = jax.vmap(assembly.a_mul)(qp, v)
    yk = jnp.zeros((B, N, 6), dt)
    ye = jnp.zeros((B, 2), dt)

    def step(_, state):
        v, zk, ze, yk, ye = state
        rhs = st.sigma * v + jax.vmap(assembly.at_mul)(
            qp, rk * zk - yk, re * ze - ye)
        vt = btridiag.solve_batched(Ci, W, rhs)
        ztk, zte = jax.vmap(assembly.a_mul)(qp, vt)
        v_new = st.alpha * vt + (1 - st.alpha) * v
        ztmp_k = st.alpha * ztk + (1 - st.alpha) * zk + yk / rk
        ztmp_e = st.alpha * zte + (1 - st.alpha) * ze + ye / re
        zk_new = jnp.clip(ztmp_k, lb_knot, ub_knot)
        ze_new = jnp.clip(ztmp_e, lb_end, ub_end)
        return (v_new, zk_new, ze_new, rk * (ztmp_k - zk_new),
                re * (ztmp_e - ze_new))

    iters = 3
    ref = jax.lax.fori_loop(0, iters, step, (v, zk, ze, yk, ye))

    lane = lambda a: jnp.moveaxis(a, 0, -1)
    geom = qp.coll_coef[:1, 0, :, 1]
    es_l = lane((jnp.arange(N)[None, :] == qp.end_idx[:, None])
                .astype(dt))[:, None, :]
    zero_blk = jnp.zeros((B, 1, 6, 6), dt)
    out = fused_rounds.fused_admm_round(
        geom, lane(Ci), lane(jnp.concatenate([zero_blk, W], 1)),
        lane(qp.t_prev), lane(lb_knot), lane(ub_knot), lane(lb_end),
        lane(ub_end), lane(rk), lane(re), es_l, lane(qp.p_diag),
        lane(v), lane(zk), lane(ze), lane(yk), lane(ye),
        iters=iters, alpha=st.alpha, sigma=st.sigma, interpret=True)
    for g, r in zip([jnp.moveaxis(o, -1, 0) for o in out[:5]], ref):
        assert g.shape == r.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=5e-3, rtol=5e-3)


def test_fused_round_matches_xla_round():
    cfg = PlannerConfig(n_knots=24)
    st = QPSettings()
    qp = _chicane_qps(cfg, [0.8, -0.5, 0.0])
    B, N = qp.p_diag.shape[:2]
    dt = jnp.float32

    rk, re, diag, off = _factors(qp, st)
    C, W = jax.vmap(btridiag.factor)(diag, off)
    Ci, W = btridiag.inv_factors(C, W)
    lb_knot, ub_knot, lb_end, ub_end = jax.vmap(assembly.bounds)(qp)

    v = jnp.zeros((B, N, 6), dt)
    zk, ze = jax.vmap(assembly.a_mul)(qp, v)
    yk = jnp.zeros((B, N, 6), dt)
    ye = jnp.zeros((B, 2), dt)

    # XLA round: check_every steps of the reference iteration.
    def step(_, state):
        v, zk, ze, yk, ye = state
        rhs = st.sigma * v + jax.vmap(assembly.at_mul)(
            qp, rk * zk - yk, re * ze - ye)
        vt = btridiag.solve_batched(Ci, W, rhs)
        ztk, zte = jax.vmap(assembly.a_mul)(qp, vt)
        v_new = st.alpha * vt + (1 - st.alpha) * v
        ztmp_k = st.alpha * ztk + (1 - st.alpha) * zk + yk / rk
        ztmp_e = st.alpha * zte + (1 - st.alpha) * ze + ye / re
        zk_new = jnp.clip(ztmp_k, lb_knot, ub_knot)
        ze_new = jnp.clip(ztmp_e, lb_end, ub_end)
        return (v_new, zk_new, ze_new, rk * (ztmp_k - zk_new),
                re * (ztmp_e - ze_new))

    iters = 10
    ref = jax.lax.fori_loop(0, iters, step, (v, zk, ze, yk, ye))

    lane = lambda a: jnp.moveaxis(a, 0, -1)
    geom = qp.coll_coef[:1, 0, :, 1]
    es_l = lane((jnp.arange(N)[None, :] == qp.end_idx[:, None])
                .astype(dt))[:, None, :]
    zero_blk = jnp.zeros((B, 1, 6, 6), dt)
    out = fused_rounds.fused_admm_round(
        geom, lane(Ci), lane(jnp.concatenate([zero_blk, W], 1)),
        lane(qp.t_prev), lane(lb_knot), lane(ub_knot), lane(lb_end),
        lane(ub_end), lane(rk), lane(re), es_l, lane(qp.p_diag),
        lane(v), lane(zk), lane(ze), lane(yk), lane(ye),
        iters=iters, alpha=st.alpha, sigma=st.sigma, interpret=True)
    got = [jnp.moveaxis(o, -1, 0) for o in out[:5]]
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=5e-3, rtol=5e-3)

    # In-kernel residual scales must match the XLA formulas on the final
    # iterate (the termination + adaptive-rho inputs, OSQP semantics).
    vr, zkr, zer, ykr, yer = ref
    Avk, Ave = jax.vmap(assembly.a_mul)(qp, vr)
    pv = qp.p_diag * vr
    Aty = jax.vmap(assembly.at_mul)(qp, ykr, yer)
    amax = lambda a: jnp.max(jnp.abs(a.reshape(a.shape[0], -1)), axis=-1)
    inf2 = lambda a, b: jnp.maximum(amax(a), amax(b))
    want = jnp.stack([
        inf2(Avk - zkr, Ave - zer),
        amax(pv + Aty),
        jnp.maximum(inf2(Avk, Ave), inf2(zkr, zer)),
        jnp.maximum(amax(pv), amax(Aty)),
    ], axis=0)
    np.testing.assert_allclose(np.asarray(out[5]), np.asarray(want),
                               atol=5e-3, rtol=5e-3)
