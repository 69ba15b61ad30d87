"""Collision-bound extraction from the ESDF.

TPU-native re-design of ``updateBoundsImproved`` and
``getClearanceWithDirectionStrict`` (reference:
src/data_struct/reference_path_impl.cpp:177-312): for every sampled reference
state, ray-march the distance field left and right along the path normal to
find the drivable lateral corridor at the front axle, rear axle and center,
then truncate the horizon at the first zero-width corridor (blocked path).

Every data-dependent while-loop of the reference becomes a fixed-iteration
masked reduction (coarse 0.3 m steps to 6 m, then 0.05 m refinement — the
reference's exact schedule), vectorized over knots; ``vmap`` adds the scenario
batch axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_pathopt import maps, splines
from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.geometry import global_to_local
from tpu_pathopt.refpath import CorridorBounds, RefStates

_COARSE_DS = 0.3
_FINE_DS = 0.05
_SEARCH_RADIUS = 0.5
_COARSE_STEPS = 20        # 6.0 m / 0.3 m
_FINE_STEPS = 5           # int(0.3/0.05) - 1


def _march(gm: maps.GridMap, x, y, angle, steps: int, ds: float):
    """Number of consecutive steps (1-based positions i*ds) whose clearance
    stays >= the search radius before the first violation. Shapes broadcast
    over x/y/angle."""
    i = jnp.arange(1, steps + 1, dtype=jnp.float32)
    px = x[..., None] + i * ds * jnp.cos(angle)[..., None]
    py = y[..., None] + i * ds * jnp.sin(angle)[..., None]
    clear = maps.obstacle_distance(gm, px, py)
    bad = clear < _SEARCH_RADIUS
    # index of first violation; steps if none
    return jnp.argmax(
        jnp.concatenate([bad, jnp.ones_like(bad[..., :1], bool)], -1)
        .astype(jnp.int32), axis=-1)


def clearance_strict(gm: maps.GridMap, x, y, heading, config: PlannerConfig):
    """Lateral (left, right) drivable bounds at a state, reference semantics
    (getClearanceWithDirectionStrict, reference_path_impl.cpp:232-312).
    Vectorized over any leading shape. Returns (left_bound, right_bound) with
    left >= right, or (0, 0) when the state itself is in collision or the
    corridor collapses.

    Known deviation: the reference's fine refinement of the *right* side
    (:289-299) multiplies an already-negative ``right_bound`` by the
    right-direction unit vector, so it actually probes mirrored positions on
    the LEFT side of the path. We refine each side along its own direction
    (geometrically correct); worst-case difference vs the reference is the
    0.25 m refinement span on the right bound."""
    # Both sides ride ONE stacked gather per phase: measured TPU gather
    # throughput rises with the number of indices per call (0.08 G/s at
    # 0.5M -> 0.17 G/s at 3M), so two half-size marches cost ~1.5x one
    # stacked march. The leading axis of ``ang2`` is (left, right).
    ang2 = jnp.stack([heading + jnp.pi / 2, heading - jnp.pi / 2])

    origin_clear = maps.obstacle_distance(gm, x, y)
    ok = origin_clear > _SEARCH_RADIUS

    # Coarse march: reference breaks at the first step with clearance < 0.5
    # and keeps bound = (last good step) * ds; no break -> (steps-1)*ds.
    hits2 = _march(gm, x[None], y[None], ang2, _COARSE_STEPS, _COARSE_DS)

    def coarse_bound(hits):
        # Break at step j (0-based position (j+1)*ds) -> bound j*ds;
        # no break -> (steps-1)*ds (the reference subtracts a step either way
        # since right_s has already been incremented, :249-271).
        return jnp.where(hits < _COARSE_STEPS,
                         hits.astype(jnp.float32) * _COARSE_DS,
                         (_COARSE_STEPS - 1) * _COARSE_DS)

    base2 = coarse_bound(hits2)

    # Fine refinement forward from the coarse bound (reference :276-299),
    # both sides in one stacked probe call.
    def refine(base, angle):
        i = jnp.arange(1, _FINE_STEPS + 1, dtype=jnp.float32)
        px = x[None, ..., None] \
            + (base[..., None] + i * _FINE_DS) * jnp.cos(angle)[..., None]
        py = y[None, ..., None] \
            + (base[..., None] + i * _FINE_DS) * jnp.sin(angle)[..., None]
        clear = maps.obstacle_distance(gm, px, py)
        bad = clear < _SEARCH_RADIUS
        good = jnp.argmax(
            jnp.concatenate([bad, jnp.ones_like(bad[..., :1], bool)], -1)
            .astype(jnp.int32), axis=-1)
        return base + jnp.minimum(good, _FINE_STEPS).astype(jnp.float32) * _FINE_DS

    ref2 = refine(base2, ang2)
    left_b, right_b = ref2[0], ref2[1]

    diff_radius = config.car_width * 0.5 - _SEARCH_RADIUS
    left = left_b - diff_radius
    right = -(right_b - diff_radius)
    collapsed = left < right

    # Hard safety margin, capped so >= 0.2 m of corridor remains (:304-311).
    space = left - right
    max_margin = jnp.maximum(0.0, (space - 0.2) / 2.0)
    margin = jnp.minimum(config.safety_margin, max_margin)
    left = left - margin
    right = right + margin

    zero = jnp.zeros_like(left)
    invalid = (~ok) | collapsed
    return jnp.where(invalid, zero, left), jnp.where(invalid, zero, right)


def update_bounds_on_input_states(gm: maps.GridMap, xs: splines.CubicSpline,
                                  ys: splines.CubicSpline, ref: RefStates,
                                  input_d_heading,
                                  config: PlannerConfig) -> CorridorBounds:
    """Bound re-extraction around a solved path
    (``updateBoundsOnInputStates``, reference_path_impl.cpp:117-175): identical
    to ``update_bounds`` except the axle offsets shrink with the input path's
    heading error, ``L_new = L * (1 - cos(d_heading))`` (:129-130), and the
    center corridor is always extracted (:161). The reference declares this
    for re-extraction between the two SQP passes but leaves the call commented
    out (path_optimizer.cpp:148); it is exposed here as a real API.
    """
    one_minus_cos = 1.0 - jnp.cos(input_d_heading)
    return _update_bounds_impl(
        gm, xs, ys, ref,
        front_len=config.front_length * one_minus_cos,
        rear_len=config.rear_length * one_minus_cos,
        config=config, with_center=True)


def update_bounds(gm: maps.GridMap, xs: splines.CubicSpline,
                  ys: splines.CubicSpline, ref: RefStates,
                  config: PlannerConfig,
                  with_center: bool = False) -> CorridorBounds:
    """Per-knot corridor at front/rear axle centers projected onto the spline
    (updateBoundsImproved, reference_path_impl.cpp:177-230) + blocked horizon
    truncation.

    ``with_center`` additionally fills the center-state corridor. The
    reference computes it too (reference_path_impl.cpp:207) but the path QP
    only consumes front/rear (base_solver.cpp:193-206) unless
    rough_constraints_far_away is on, so the pipeline can skip it — a third of
    the clearance ray-marching cost."""
    return _update_bounds_impl(gm, xs, ys, ref,
                               front_len=jnp.asarray(config.front_length),
                               rear_len=jnp.asarray(config.rear_length),
                               config=config, with_center=with_center)


def _update_bounds_impl(gm, xs, ys, ref: RefStates, front_len, rear_len,
                        config: PlannerConfig,
                        with_center: bool) -> CorridorBounds:
    cfg = config
    eps = cfg.epsilon

    # Both axles ride ONE stacked (2, N) projection + clearance chain: the
    # Newton loop and the clearance marches are latency-bound sequences of
    # dependent ops, so doubling their width is free while running the axles
    # separately doubles the whole chain (measured ~2x on this stage).
    L = jnp.stack([jnp.broadcast_to(front_len, ref.x.shape),
                   jnp.broadcast_to(rear_len, ref.x.shape)])      # (2, N)
    cx = ref.x + L * jnp.cos(ref.heading)
    cy = ref.y + L * jnp.sin(ref.heading)
    # Directional Newton projection of the axle centers onto the spline
    # along the state normal (reference :192-205).
    max_s = jnp.broadcast_to(ref.s + 5.0, L.shape)
    hint = ref.s + L
    normal = jnp.broadcast_to(ref.heading + jnp.pi / 2, L.shape)
    proj_s = splines.project_directional_newton(
        xs, ys, cx, cy, normal, max_s, hint, iters=config.newton_iters)
    if cfg.directional_prescan_fallback:
        # Bounded grid pre-scan (the reference's getDirectionalProjection
        # with its min-tracking bug fixed) as a rescue when Newton from
        # the arc-length hint diverges; keep whichever candidate lands
        # closer to the ray.
        alt_s = splines.project_directional(
            xs, ys, cx, cy, normal, max_s,
            start_s=jnp.maximum(jnp.broadcast_to(ref.s, L.shape) - 5.0, 0.0),
            grid=0.5, max_grid_points=21, iters=config.newton_iters)
        r_newton = splines.directional_ray_residual(
            xs, ys, cx, cy, normal, proj_s)
        r_alt = splines.directional_ray_residual(
            xs, ys, cx, cy, normal, alt_s)
        # A diverged Newton can return NaN; NaN comparisons are False, which
        # would keep the bad Newton result — map non-finite residuals to +inf
        # so the prescan rescue actually fires on the case it exists for.
        r_newton = jnp.where(jnp.isfinite(r_newton), r_newton, jnp.inf)
        r_alt = jnp.where(jnp.isfinite(r_alt), r_alt, jnp.inf)
        proj_s = jnp.where(r_alt < r_newton, alt_s, proj_s)
    px = splines.evaluate(xs, proj_s)
    py = splines.evaluate(ys, proj_s)
    # Clearance at the projected points, with the *state* heading (:206).
    left, right = clearance_strict(
        gm, px, py, jnp.broadcast_to(ref.heading, L.shape), cfg)
    # Shift into the axle-center frame (:209-215): offset = lateral
    # coordinate of the projected point in the axle-center frame.
    _, off, _ = global_to_local(cx, cy, ref.heading, px, py)
    ub = left + off
    lb = right + off
    front_ub, front_lb = ub[0], lb[0]
    rear_ub, rear_lb = ub[1], lb[1]
    if with_center:
        center_ub, center_lb = clearance_strict(gm, ref.x, ref.y, ref.heading,
                                                cfg)
    else:
        center_ub = jnp.zeros_like(front_ub)
        center_lb = jnp.zeros_like(front_lb)

    # Blocked detection: zero-width front or rear corridor (:220-229).
    zero_width = (jnp.abs(front_ub - front_lb) < eps) | \
                 (jnp.abs(rear_ub - rear_lb) < eps)
    zero_width = zero_width & ref.mask
    any_blocked = jnp.any(zero_width)
    first_blocked = jnp.argmax(zero_width.astype(jnp.int32))
    n_valid = jnp.where(any_blocked,
                        jnp.minimum(ref.n_valid, first_blocked),
                        ref.n_valid)

    return CorridorBounds(
        front_lb=front_lb, front_ub=front_ub,
        rear_lb=rear_lb, rear_ub=rear_ub,
        center_lb=center_lb, center_ub=center_ub,
        blocked=any_blocked, n_valid=n_valid.astype(jnp.int32),
        front_x=cx[0], front_y=cy[0], rear_x=cx[1], rear_y=cy[1],
        heading=ref.heading)
