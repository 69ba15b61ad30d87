"""End-to-end batched path optimization pipeline.

TPU-native re-design of ``PathOptimizer::solve`` (reference:
src/path_optimizer.cpp:34-71) — the full query pipeline:

    raw points -> B-spline fit -> 1 m segmentation -> TENSION2 smoothing QP
    -> DP corridor search -> post-smoothing QP -> 0.3 m resampling
    -> ESDF collision bounds -> two-pass lateral path QP -> SlState path

The batch (scenario) axis is first-class: per-scenario geometry stages are
``vmap``-ed, while the three QP stages run through *natively batched* ADMM
solvers (``qp.admm.solve_qp_batched`` / ``solver.solve_path_qp_batched``)
whose factorization control flow is shared across the batch — the difference
between ~100 and ~1000+ solves/s/chip. ``shard_map`` (see ``tpu_pathopt.dist``)
shards the batch across a TPU mesh.

The pipeline is decomposed into named stage functions; ``solve_batch`` fuses
them under one jit (the hot path) while ``solve_batch_profiled`` runs them
stage-by-stage with host-side timing — the equivalent of the reference's
``TimeRecorder`` instrumentation (path_optimizer.cpp:41-69).

Stage failures (too few points, >75 deg initial heading error, vehicle too far
from the reference, short DP corridor, non-converged QPs) follow the
reference's abort semantics (path_optimizer.cpp:50-66) but are reported as
flags on the result instead of C++ early returns — the batch keeps flowing,
masked.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from tpu_pathopt import bounds as bounds_mod
from tpu_pathopt import bspline, corridor, maps, refpath, splines
from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.geometry import constrain_angle, global_to_local, normal_offset
from tpu_pathopt.qp.admm import QPSettings
from tpu_pathopt.refpath import CorridorBounds
from tpu_pathopt.smoothing import segment_raw_reference
from tpu_pathopt.smoothing.post_smooth import post_smooth_batched
from tpu_pathopt.smoothing.tension import tension_smooth_batched
from tpu_pathopt.smoothing.tension2 import tension2_smooth_batched
from tpu_pathopt.solver import assemble_path_qp
from tpu_pathopt.solver.path_solver import solve_path_qp_batched


@flax.struct.dataclass
class Scenario:
    """One query: raw reference points + start/target states
    (reference: demo.cpp click callbacks + PathOptimizer ctor)."""

    raw_x: jax.Array        # (R,) padded raw reference points
    raw_y: jax.Array
    n_raw: jax.Array        # () int32
    start_x: jax.Array
    start_y: jax.Array
    start_heading: jax.Array
    start_k: jax.Array
    target_x: jax.Array
    target_y: jax.Array
    target_heading: jax.Array


@flax.struct.dataclass
class PathResult:
    """Optimized SlState path (reference: data_struct.hpp:28-32 + getOptimizedPath,
    base_solver.cpp:263-288)."""

    x: jax.Array            # (N,)
    y: jax.Array
    heading: jax.Array
    l: jax.Array
    d_heading: jax.Array
    k: jax.Array
    d_k: jax.Array
    s: jax.Array
    n_valid: jax.Array      # () int32
    ok: jax.Array           # () bool — full-pipeline success
    blocked: jax.Array      # () bool — horizon truncated at an obstacle
    qp_iters: jax.Array     # () int32 — total ADMM iterations (both passes)
    # Per-stage flags (the reference logs and aborts per stage,
    # path_optimizer.cpp:50-66; here they are surfaced for observability):
    ok_input: jax.Array     # >= 4 raw points
    ok_smooth: jax.Array    # smoothing QP converged
    ok_corridor: jax.Array  # DP search reached the lattice / vehicle near ref
    ok_post: jax.Array      # post-smoothing QP (>= 4 layers + converged)
    ok_init: jax.Array      # initial heading error <= 75 deg
    ok_qp: jax.Array        # both path-QP passes converged
    # () bool — the static n_knots did not reach the trimmed reference length,
    # so the end-state rows bind short of the target (see RefStates.truncated).
    horizon_truncated: jax.Array
    # Per-knot collision corridor used by the path QP — the reference exposes
    # it via getReferencePath()->getBounds() and dumps it on solver failure
    # (logBoundsInfo, reference_path_impl.cpp:88-95; see diagnostics.py).
    bounds: CorridorBounds

    @property
    def mask(self):
        n = self.x.shape[-1]
        return jnp.arange(n) < self.n_valid[..., None] \
            if self.n_valid.ndim else jnp.arange(n) < self.n_valid


def _refit_splines(x, y, n_valid, step=1.0):
    """Cumulative-arc-length natural-spline refit of a masked polyline
    (the reference's recurring set_points pattern)."""
    M = x.shape[0]
    seg = jnp.hypot(jnp.diff(x), jnp.diff(y))
    seg = jnp.where(jnp.arange(M - 1) <= n_valid - 2,
                    jnp.maximum(seg, 1e-6), step)
    s = jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(seg)])
    xs = splines.fit_natural(s, x, n_valid=n_valid)
    ys = splines.fit_natural(s, y, n_valid=n_valid)
    s_max = jnp.take(s, n_valid - 1)
    return xs, ys, s_max


# ------------------------------ pipeline stages ------------------------------
# Each stage is a standalone jittable function over pytrees, shared verbatim
# by the fused hot path (solve_batch) and the profiled stage-by-stage path
# (solve_batch_profiled).

def stage_prep(scs: Scenario, config: PlannerConfig):
    """B-spline fit (reference_path_smoother.cpp:490-524) + 1 m segmentation
    (:47-85), per scenario."""
    cfg = config

    def prep(sc):
        ok_input = sc.n_raw >= 4
        xb, yb, sb, nb = bspline.fit_and_sample(sc.raw_x, sc.raw_y, sc.n_raw,
                                                cfg.bspline_samples)
        return (ok_input,) + segment_raw_reference(xb, yb, sb, nb,
                                                   cfg.n_segment_points)

    return jax.vmap(prep)(scs)


def stage_smooth(gm: maps.GridMap, prep_out, config: PlannerConfig,
                 settings: QPSettings):
    """Smoothing QP, batched (TENSION2 default; tension_smoother_2.cpp:20-72)."""
    ok_input, xg, yg, sg, ang, kg, n_seg = prep_out
    if config.smoothing_method == "TENSION2":
        return tension2_smooth_batched(xg, yg, ang, kg, sg, n_seg, config,
                                       settings)
    return tension_smooth_batched(gm, xg, yg, ang, n_seg, config, settings)


def stage_corridor(gm: maps.GridMap, scs: Scenario, smooth_out,
                   config: PlannerConfig):
    """Smoothed-spline refit + DP corridor search (graphSearchDp, :142-295).
    The reference extends the smoothed spline 3 m past the fit
    (tension_smoother.cpp:40-41).

    The DP variant splits per-scenario lattice construction / finishing
    (vmapped) from the layer-sequential forward pass, which runs batched —
    one fused Pallas kernel over the whole batch on TPU
    (corridor.dp_forward_batched) instead of B interleaved 31-step scans."""
    x2, y2, s2, n2, ok_smooth = smooth_out

    if config.corridor_method == "ASTAR":
        def mid(sc, x2_i, y2_i, n2_i):
            xs2, ys2, s2_max = _refit_splines(x2_i, y2_i, n2_i)
            cor = corridor.search_corridor_astar(
                gm, xs2, ys2, s2_max + 3.0, sc.start_x, sc.start_y,
                sc.start_heading, config)
            return xs2, ys2, cor

        return jax.vmap(mid)(scs, x2, y2, n2)

    def pre(sc, x2_i, y2_i, n2_i):
        xs2, ys2, s2_max = _refit_splines(x2_i, y2_i, n2_i)
        lat = corridor.prepare_lattice(
            gm, xs2, ys2, s2_max + 3.0, sc.start_x, sc.start_y,
            sc.start_heading, config)
        return xs2, ys2, lat

    xs2, ys2, lat = jax.vmap(pre)(scs, x2, y2, n2)
    costs, parents, alives = corridor.dp_forward_batched(lat, config)
    cor = jax.vmap(
        lambda la, c, p, a: corridor.finish_corridor(gm, la, c, p, a, config)
    )(lat, costs, parents, alives)
    return xs2, ys2, cor


def stage_post_smooth(cor, config: PlannerConfig, settings: QPSettings):
    """Post-smoothing QP, batched (postSmooth, :526-580)."""
    l_post, post_ok, conv_post = post_smooth_batched(
        cor.layers_s, cor.lower, cor.upper, cor.vehicle_l, cor.n_layers,
        config, settings)
    return l_post, post_ok & conv_post


# Batch chunk for the geometry stage. Its Newton-projection chains build
# (B, queries, segments) one-hot select intermediates; past ~512 scenarios
# they outgrow XLA's fusion buffers and the bounds stage regresses
# per-solve (measured +8.5% us/solve at B=1024 while every other stage
# still improves — PERF.md batch sweep). Chunking the batch at the knee
# bounds the working set; chunks run under lax.map like the path QP's
# 128-lane chunks.
_GEO_CHUNK = 512


def stage_geometry(gm: maps.GridMap, scs: Scenario, xs2, ys2, cor, l_post,
                   config: PlannerConfig):
    """Re-projection, init state, trim, resample, collision bounds, per
    scenario (processReferencePath, path_optimizer.cpp:105-122)."""
    cfg = config
    N = cfg.n_knots

    def late(sc, xs2_i, ys2_i, cor_i, l_post_i):
        ref_dir = splines.heading(xs2_i, ys2_i, cor_i.layers_s)
        x3, y3 = normal_offset(splines.evaluate(xs2_i, cor_i.layers_s),
                               splines.evaluate(ys2_i, cor_i.layers_s),
                               ref_dir, l_post_i)
        xs3, ys3, s3_max = _refit_splines(x3, y3, cor_i.n_layers)
        length3 = s3_max

        # Init state (processInitState, path_optimizer.cpp:73-85).
        ix = splines.evaluate(xs3, 0.0)
        iy = splines.evaluate(ys3, 0.0)
        ih = splines.heading(xs3, ys3, 0.0)
        _, local_y, _ = global_to_local(sc.start_x, sc.start_y,
                                        sc.start_heading, ix, iy)
        min_dist = jnp.hypot(ix - sc.start_x, iy - sc.start_y)
        init_offset = jnp.where(local_y < 0.0, min_dist, -min_dist)
        init_heading_error = constrain_angle(sc.start_heading - ih)
        ok_init = jnp.abs(init_heading_error) <= 75.0 * jnp.pi / 180.0

        # Trim to the target projection (setReferencePathLength, :87-103).
        ex = splines.evaluate(xs3, length3)
        ey = splines.evaluate(ys3, length3)
        eh = splines.heading(xs3, ys3, length3)
        local_tx, _, _ = global_to_local(ex, ey, eh, sc.target_x, sc.target_y)
        proj_s = splines.project(xs3, ys3, sc.target_x, sc.target_y, length3,
                                 iters=cfg.newton_iters)
        length3 = jnp.where(local_tx > 0.0, length3, proj_s)

        # Resample at output spacing (buildReferenceFromSpline).
        ref = refpath.build_reference_from_spline(xs3, ys3, length3, N, cfg)

        # Collision bounds + blocked truncation (updateBoundsImproved).
        # Center bounds are only consumed by the rough far-away rows.
        cb = bounds_mod.update_bounds(
            gm, xs3, ys3, ref, cfg,
            with_center=cfg.rough_constraints_far_away)
        n_valid = jnp.minimum(ref.n_valid, cb.n_valid)
        ref = ref.replace(n_valid=n_valid)
        return ref, cb, init_offset, init_heading_error, ok_init, n_valid

    run = jax.vmap(late)
    B = l_post.shape[0]
    if B > _GEO_CHUNK:
        # Full chunks under lax.map; the (< _GEO_CHUNK) remainder runs as
        # one plain vmap — it is itself within the fusion working-set bound,
        # so every B > _GEO_CHUNK is covered, not just exact multiples.
        m = (B // _GEO_CHUNK) * _GEO_CHUNK
        nch = m // _GEO_CHUNK
        args = (scs, xs2, ys2, cor, l_post)
        head = jax.tree_util.tree_map(
            lambda a: a[:m].reshape((nch, _GEO_CHUNK) + a.shape[1:]), args)
        out = jax.lax.map(lambda t: run(*t), head)
        out = jax.tree_util.tree_map(
            lambda a: a.reshape((m,) + a.shape[2:]), out)
        if m == B:
            return out
        tail = run(*jax.tree_util.tree_map(lambda a: a[m:], args))
        return jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=0), out, tail)
    return run(scs, xs2, ys2, cor, l_post)


@flax.struct.dataclass
class QPWarmStart:
    """Path-QP solver state carried across REPEATED solves of an evolving
    query — the TPU analogue of the reference demo's persistent OSQP solver
    object in its 30 Hz replanning loop (demo.cpp:133-211 re-solves as the
    vehicle advances; OSQP warm-starts from the previous solution,
    base_solver.cpp:97-117). Produced by ``solve_batch_warm``; feed it back
    on the next solve of the SAME (advanced) scenarios."""

    v: jax.Array         # (B, N, 6) previous pass-2 primal iterate
    y_knot: jax.Array    # (B, N, 6) duals (z layout)
    y_end: jax.Array     # (B, 2)
    rho_bar: jax.Array   # (B,) final adapted rho
    valid: jax.Array     # (B,) bool — cold-start lanes where False

    @classmethod
    def cold(cls, batch: int, config: PlannerConfig):
        N = config.n_knots
        return cls(v=jnp.zeros((batch, N, 6)),
                   y_knot=jnp.zeros((batch, N, 6)),
                   y_end=jnp.zeros((batch, 2)),
                   rho_bar=jnp.zeros((batch,)),
                   valid=jnp.zeros((batch,), bool))


def build_path_qp(scs: Scenario, geo_out, config: PlannerConfig, sol1=None):
    """Assemble the batched path QP from the geometry stage's outputs —
    pass 1 when ``sol1`` is None (inputs = zero offset/heading error, the
    reference curvature), else pass 2 linearized around pass 1's solution
    (optimizePath, path_optimizer.cpp:124-161). Exposed for the CLI's
    ``--verbose-qp`` per-round residual trace; ``stage_path_qp`` uses it
    for both passes."""
    cfg = config
    N = cfg.n_knots
    ref, cb, init_offset, init_heading_error, ok_init, n_valid = geo_out

    ref_heading_last = jnp.take_along_axis(
        ref.heading, (n_valid - 1)[:, None], axis=-1)[:, 0]

    def make_qp(sc, ref_i, cb_i, hl, io, ie, nv, in_l, in_e, in_k):
        return assemble_path_qp(
            ref_s=ref_i.s, ref_k=ref_i.k, ref_heading_last=hl,
            input_l=in_l, input_e=in_e, input_k=in_k,
            front_lb=cb_i.front_lb, front_ub=cb_i.front_ub,
            rear_lb=cb_i.rear_lb, rear_ub=cb_i.rear_ub,
            init_offset=io, init_heading_error=ie,
            start_k=sc.start_k,
            target_heading=sc.target_heading, blocked=cb_i.blocked,
            n_valid=nv, config=cfg,
            center_lb=cb_i.center_lb, center_ub=cb_i.center_ub)

    B = n_valid.shape[0]
    if sol1 is None:
        zeros = jnp.zeros((B, N))
        in_l, in_e, in_k = zeros, zeros, ref.k
    else:
        in_l, in_e, in_k = sol1.v[:, :, 0], sol1.v[:, :, 1], sol1.v[:, :, 2]
    return jax.vmap(make_qp)(scs, ref, cb, ref_heading_last, init_offset,
                             init_heading_error, n_valid, in_l, in_e, in_k)


def stage_path_qp(scs: Scenario, geo_out, config: PlannerConfig,
                  settings: QPSettings, warm: QPWarmStart | None = None):
    """Two-pass SQP path QP, batched (optimizePath,
    path_optimizer.cpp:124-161). ``warm`` (optional) seeds PASS 1 from a
    previous solve's final state — the replanning warm start; pass 2 always
    warm-starts from pass 1 as before."""
    ref, cb, init_offset, init_heading_error, ok_init, n_valid = geo_out
    B = n_valid.shape[0]
    N = config.n_knots
    qp1 = build_path_qp(scs, geo_out, config)
    # Difficulty-sorted pass 1: the tightest corridor width predicts ADMM
    # iteration count (tight/slalom corridors engage the soft collision
    # bounds and iterate ~3x longer than open or blocked-truncated ones), so
    # grouping by it lets the chunked solver's per-chunk termination stop
    # the easy chunks early. A pure permutation — per-element trajectories
    # are unchanged; results are scattered back before pass 2 assembly.
    mask_k = jnp.arange(N)[None, :] < n_valid[:, None]
    width = jnp.where(mask_k, jnp.minimum(cb.front_ub - cb.front_lb,
                                          cb.rear_ub - cb.rear_lb), jnp.inf)
    order1 = jnp.argsort(-jnp.min(width, axis=-1))
    inv1 = jnp.argsort(order1)
    dtp = qp1.p_diag.dtype
    if warm is None:
        v0_1 = y0k_1 = y0e_1 = None
        rho0_1 = jnp.full((B,), settings.rho_bar_path, dtp)
    else:
        # Replanning warm start: lanes with warm.valid seed pass 1 from the
        # previous solve's final (v, y, rho); cold lanes start from zeros
        # with the configured initial rho (identical to warm=None).
        w3 = warm.valid[:, None, None]
        v0_1 = jnp.where(w3, warm.v.astype(dtp), 0.0)
        y0k_1 = jnp.where(w3, warm.y_knot.astype(dtp), 0.0)
        y0e_1 = jnp.where(warm.valid[:, None], warm.y_end.astype(dtp), 0.0)
        rho0_1 = jnp.where(warm.valid, warm.rho_bar.astype(dtp),
                           settings.rho_bar_path)
    sol1_s = solve_path_qp_batched(
        jax.tree_util.tree_map(lambda a: a[order1], qp1),
        v0=None if v0_1 is None else v0_1[order1],
        y0_knot=None if y0k_1 is None else y0k_1[order1],
        y0_end=None if y0e_1 is None else y0e_1[order1],
        settings=settings, rho0=rho0_1[order1])
    sol1 = jax.tree_util.tree_map(lambda a: a[inv1], sol1_s)
    qp2 = build_path_qp(scs, geo_out, config, sol1=sol1)
    # Difficulty-sorted pass 2: pass-1 iteration counts predict pass-2
    # difficulty, so grouping scenarios by them concentrates stragglers into
    # few 128-lane chunks — the chunked solver's per-chunk termination
    # (path_solver._solve_batched_impl) then stops the easy chunks early
    # instead of every chunk paying the global straggler tail. A pure
    # permutation: per-element solver trajectories are unchanged; results
    # are scattered back in input order.
    order = jnp.argsort(sol1.iters)
    inv = jnp.argsort(order)
    sort_b = lambda t: jax.tree_util.tree_map(lambda a: a[order], t)
    # rho0 carries pass-1's final per-element rho into pass 2 — OSQP keeps
    # rho across warm-started re-solves (the reference's pass 2 reuses the
    # same solver object, base_solver.cpp:97-117); restarting adaptation
    # from scratch measured up to 2x the pass-2 iterations.
    sol2_s = solve_path_qp_batched(
        sort_b(qp2), v0=sol1.v[order], y0_knot=sol1.y_knot[order],
        y0_end=sol1.y_end[order], settings=settings,
        rho0=sol1.rho_bar[order])
    sol2 = jax.tree_util.tree_map(lambda a: a[inv], sol2_s)
    return sol1, sol2


def stage_finalize(ref, sol2, n_valid, config: PlannerConfig):
    """Output path (getOptimizedPath, base_solver.cpp:263-288)."""
    N = config.n_knots

    def finalize(ref_i, v, nv):
        l = v[:, 0]
        e = v[:, 1]
        k = v[:, 2]
        dk = v[:, 3]
        x_out, y_out = normal_offset(ref_i.x, ref_i.y, ref_i.heading, l)
        heading_out = constrain_angle(ref_i.heading + e)
        seg = jnp.hypot(jnp.diff(x_out), jnp.diff(y_out))
        seg = jnp.where(jnp.arange(N - 1) <= nv - 2, seg, 0.0)
        s_out = jnp.concatenate([jnp.zeros((1,), x_out.dtype),
                                 jnp.cumsum(seg)])
        return x_out, y_out, heading_out, l, e, k, dk, s_out

    return jax.vmap(finalize)(ref, sol2.v, n_valid)


# --------------------------------- drivers ----------------------------------

def solve_batch(gm: maps.GridMap, scenarios: Scenario, config: PlannerConfig,
                settings: QPSettings | None = None) -> PathResult:
    """Solve a batch of scenarios sharing one grid map (the
    scenario-data-parallel axis; SURVEY.md §2.8). Every Scenario leaf has a
    leading batch dimension.

    ``settings=None`` derives the solver settings from the config's qp_*
    fields (``config.qp_settings()``) so e.g. ``qp_max_iter`` is live."""
    if settings is None:
        settings = config.qp_settings()
    # TPU matmuls default to bf16 operands; the ADMM iterations need full f32
    # products or the 2e-3 termination tolerance is unreachable.
    with jax.default_matmul_precision("highest"):
        return _solve_batch_impl(gm, scenarios, config, settings)


def run_to_geometry(gm: maps.GridMap, scs: Scenario, config: PlannerConfig,
                    settings: QPSettings):
    """Run the stage chain up through ``stage_geometry``: the shared
    front half of every driver that needs the assembled path-QP inputs
    (``_solve_batch_impl``, the CLI's ``--verbose-qp`` trace, custom
    drives). Returns ``(geo_out, (ok_input, ok_smooth, cor, ok_post))``.
    One spelling of the chain so a stage-signature change cannot silently
    miss a hand-copied variant (``solve_batch_profiled`` and
    ``bench.roofline`` stay stage-by-stage on purpose — per-stage timing
    is their point)."""
    prep_out = stage_prep(scs, config)
    smooth_out = stage_smooth(gm, prep_out, config, settings)
    xs2, ys2, cor = stage_corridor(gm, scs, smooth_out, config)
    l_post, ok_post = stage_post_smooth(cor, config, settings)
    geo_out = stage_geometry(gm, scs, xs2, ys2, cor, l_post, config)
    return geo_out, (prep_out[0], smooth_out[4], cor, ok_post)


def _solve_batch_impl(gm: maps.GridMap, scs: Scenario, config: PlannerConfig,
                      settings: QPSettings, warm: QPWarmStart | None = None,
                      return_warm: bool = False):
    geo_out, (ok_input, ok_smooth, cor, ok_post) = run_to_geometry(
        gm, scs, config, settings)
    ok_corridor = cor.ok
    ref, cb, init_offset, init_heading_error, ok_init, n_valid = geo_out
    sol1, sol2 = stage_path_qp(scs, geo_out, config, settings, warm=warm)
    ok_qp = sol1.converged & sol2.converged
    x_out, y_out, heading_out, l, e, k, dk, s_out = stage_finalize(
        ref, sol2, n_valid, config)

    ok = (ok_input & ok_smooth & ok_corridor & ok_post & ok_init & ok_qp)
    result = PathResult(
        x=x_out, y=y_out, heading=heading_out, l=l, d_heading=e, k=k, d_k=dk,
        s=s_out, n_valid=n_valid, ok=ok, blocked=cb.blocked,
        qp_iters=sol1.iters + sol2.iters,
        ok_input=ok_input, ok_smooth=ok_smooth, ok_corridor=ok_corridor,
        ok_post=ok_post, ok_init=ok_init, ok_qp=ok_qp,
        horizon_truncated=ref.truncated, bounds=cb)
    if not return_warm:
        return result
    # Solver state for the NEXT solve of the same (advanced) query — the
    # persistent-OSQP-object analogue (base_solver.cpp:97-117). Lanes whose
    # QP did not converge re-seed cold next time.
    warm_out = QPWarmStart(v=sol2.v, y_knot=sol2.y_knot, y_end=sol2.y_end,
                           rho_bar=sol2.rho_bar, valid=ok_qp)
    return result, warm_out


def solve_batch_warm(gm: maps.GridMap, scenarios: Scenario,
                     config: PlannerConfig,
                     settings: QPSettings | None = None,
                     warm: QPWarmStart | None = None):
    """One replanning solve: like :func:`solve_batch` but seeds the path QP
    from ``warm`` (a previous solve's state) and returns
    ``(PathResult, QPWarmStart)`` for the next cycle. See
    ``tpu_pathopt.replan`` for the full streamed loop."""
    if settings is None:
        settings = config.qp_settings()
    with jax.default_matmul_precision("highest"):
        return _solve_batch_impl(gm, scenarios, config, settings, warm=warm,
                                 return_warm=True)


def solve_batch_profiled(gm: maps.GridMap, scenarios: Scenario,
                         config: PlannerConfig,
                         settings: QPSettings | None = None,
                         recorder=None) -> PathResult:
    """Stage-by-stage execution with host-side per-stage timing — the
    reference's TimeRecorder instrumentation (path_optimizer.cpp:41-69,
    base_solver.cpp:57-93). ``recorder`` is a ``profiling.TimeRecorder``; each
    stage is its own jit and the recorder blocks on its outputs, so stage
    times are real device times (plus dispatch). Slower end-to-end than
    ``solve_batch`` (no cross-stage fusion) — for observability, not the hot
    path."""
    from tpu_pathopt import profiling
    if settings is None:
        settings = config.qp_settings()
    rec = recorder if recorder is not None else profiling.TimeRecorder(
        "pipeline")
    static = {"static_argnames": ("config", "settings")}

    with jax.default_matmul_precision("highest"):
        rec.record("prep")
        prep_out = jax.jit(stage_prep, static_argnames=("config",))(
            scenarios, config)
        rec.record("smooth", block_on=prep_out)
        smooth_out = jax.jit(stage_smooth, **static)(
            gm, prep_out, config, settings)
        rec.record("corridor", block_on=smooth_out)
        xs2, ys2, cor = jax.jit(stage_corridor, static_argnames=("config",))(
            gm, scenarios, smooth_out, config)
        rec.record("post_smooth", block_on=cor)
        l_post, ok_post = jax.jit(stage_post_smooth, **static)(
            cor, config, settings)
        rec.record("bounds", block_on=l_post)
        geo_out = jax.jit(stage_geometry, static_argnames=("config",))(
            gm, scenarios, xs2, ys2, cor, l_post, config)
        rec.record("path_qp", block_on=geo_out)
        sol1, sol2 = jax.jit(stage_path_qp, **static)(
            scenarios, geo_out, config, settings)
        rec.record("finalize", block_on=(sol1, sol2))
        ref, cb, init_offset, init_heading_error, ok_init, n_valid = geo_out
        outs = jax.jit(stage_finalize, static_argnames=("config",))(
            ref, sol2, n_valid, config)
        rec.record("done", block_on=outs)

    x_out, y_out, heading_out, l, e, k, dk, s_out = outs
    ok_input = prep_out[0]
    ok = (ok_input & smooth_out[4] & cor.ok & ok_post & ok_init
          & sol1.converged & sol2.converged)
    result = PathResult(
        x=x_out, y=y_out, heading=heading_out, l=l, d_heading=e, k=k, d_k=dk,
        s=s_out, n_valid=n_valid, ok=ok, blocked=cb.blocked,
        qp_iters=sol1.iters + sol2.iters,
        ok_input=ok_input, ok_smooth=smooth_out[4], ok_corridor=cor.ok,
        ok_post=ok_post, ok_init=ok_init,
        ok_qp=sol1.converged & sol2.converged,
        horizon_truncated=ref.truncated, bounds=cb)
    if recorder is None:
        rec.print_time()
    return result


def solve(gm: maps.GridMap, sc: Scenario, config: PlannerConfig,
          settings: QPSettings | None = None) -> PathResult:
    """Single-scenario solve — a batch of one through the batched pipeline
    (one code path; the reference's per-query PathOptimizer::solve)."""
    scs = jax.tree_util.tree_map(lambda a: jnp.asarray(a)[None], sc)
    res = solve_batch(gm, scs, config, settings)
    return jax.tree_util.tree_map(lambda a: a[0], res)


# Jitted entry points (config/settings are static: hashable frozen
# dataclasses). Always prefer these at call sites — eager dispatch of the
# pipeline's thousands of ops is pathologically slow on remote backends.
solve_jit = jax.jit(solve, static_argnames=("config", "settings"))
solve_batch_jit = jax.jit(solve_batch, static_argnames=("config", "settings"))
