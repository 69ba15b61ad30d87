import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathopt import bounds, maps, splines
from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.refpath import RefStates, build_reference_from_spline


def _corridor_map(res=0.1, half_width=5.0, size=200):
    """Free strip |y| < half_width between two solid walls, x spans the map."""
    mask = np.zeros((size, size), bool)
    # grid_map convention: col 0 -> max y; y = (size/2 - 0.5 - j) * res
    ys = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[:, np.abs(ys) >= half_width] = True
    return maps.build_map(jnp.asarray(mask), resolution=res)


def test_clearance_strict_straight_corridor():
    cfg = PlannerConfig()
    gm = _corridor_map()
    # State at origin, heading +x: walls at y=±5 (ESDF ~ 5 - |y|).
    left, right = bounds.clearance_strict(
        gm, jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0), cfg)
    # March stops at 4.5 m (clearance < 0.5 beyond); minus (car_width/2 - 0.5)
    # = 0.5; minus safety margin 0.3 -> ±3.7.
    np.testing.assert_allclose(float(left), 3.7, atol=0.15)
    np.testing.assert_allclose(float(right), -3.7, atol=0.15)


def test_clearance_strict_in_collision_returns_zero():
    cfg = PlannerConfig()
    gm = _corridor_map()
    # State inside the wall.
    left, right = bounds.clearance_strict(
        gm, jnp.asarray(0.0), jnp.asarray(6.0), jnp.asarray(0.0), cfg)
    assert float(left) == 0.0 and float(right) == 0.0


def test_update_bounds_straight_reference():
    cfg = PlannerConfig(n_knots=64)
    gm = _corridor_map()
    # Straight reference along x from -8 to 4 at y = 0 (front axle stays
    # inside the map; beyond the map edge distance = 0 -> blocked).
    s = np.linspace(0, 12, 30)
    xs = splines.fit_natural(jnp.asarray(s), jnp.asarray(s - 8.0))
    ys = splines.fit_natural(jnp.asarray(s), jnp.zeros(30))
    ref = build_reference_from_spline(xs, ys, jnp.asarray(12.0), 64, cfg)
    cb = bounds.update_bounds(gm, xs, ys, ref, cfg)
    assert not bool(cb.blocked)
    nv = int(cb.n_valid)
    assert nv == int(ref.n_valid)
    f_ub = np.asarray(cb.front_ub)[: nv - 2]
    f_lb = np.asarray(cb.front_lb)[: nv - 2]
    np.testing.assert_allclose(f_ub, 3.75, atol=0.2)
    np.testing.assert_allclose(f_lb, -3.75, atol=0.2)


def test_update_bounds_blocked():
    cfg = PlannerConfig(n_knots=64)
    res = 0.1
    size = 200
    mask = np.zeros((size, size), bool)
    ys_w = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[:, np.abs(ys_w) >= 5.0] = True
    # Solid wall across the corridor at x = 4.
    xs_w = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[np.abs(xs_w - 4.0) < 0.3, :] = True
    gm = maps.build_map(jnp.asarray(mask), resolution=res)
    s = np.linspace(0, 12, 30)
    xs = splines.fit_natural(jnp.asarray(s), jnp.asarray(s - 8.0))
    ys = splines.fit_natural(jnp.asarray(s), jnp.zeros(30))
    ref = build_reference_from_spline(xs, ys, jnp.asarray(12.0), 64, cfg)
    cb = bounds.update_bounds(gm, xs, ys, ref, cfg)
    assert bool(cb.blocked)
    # Truncated before the wall: the valid knots end before x = 4 (s = 12).
    assert int(cb.n_valid) < int(ref.n_valid)
    s_blocked = float(ref.s[int(cb.n_valid)])
    assert 6.0 < s_blocked < 12.5  # front axle (3.9 m ahead) hits the wall early


def test_update_bounds_on_input_states_zero_error_equals_center():
    """With zero heading error the scaled axle offsets L*(1-cos(0)) vanish, so
    front/rear bounds coincide with the center corridor
    (reference_path_impl.cpp:129-130)."""
    cfg = PlannerConfig(n_knots=64)
    gm = _corridor_map()
    s = np.linspace(0, 12, 30)
    xs = splines.fit_natural(jnp.asarray(s), jnp.asarray(s - 8.0))
    ys = splines.fit_natural(jnp.asarray(s), jnp.zeros(30))
    ref = build_reference_from_spline(xs, ys, jnp.asarray(12.0), 64, cfg)
    cb = bounds.update_bounds_on_input_states(
        gm, xs, ys, ref, jnp.zeros((64,)), cfg)
    nv = int(cb.n_valid)
    np.testing.assert_allclose(np.asarray(cb.front_ub)[:nv],
                               np.asarray(cb.center_ub)[:nv], atol=1e-5)
    np.testing.assert_allclose(np.asarray(cb.rear_lb)[:nv],
                               np.asarray(cb.center_lb)[:nv], atol=1e-5)
    # Interior knots: the straight-corridor analytic corridor (see
    # test_update_bounds_straight_reference).
    np.testing.assert_allclose(np.asarray(cb.front_ub)[: nv - 2], 3.75,
                               atol=0.2)


def test_update_bounds_on_input_states_heading_error_shrinks():
    """Nonzero heading error pulls the probe centers toward the state (smaller
    axle offsets) — bounds stay finite and the corridor stays symmetric."""
    cfg = PlannerConfig(n_knots=64)
    gm = _corridor_map()
    s = np.linspace(0, 12, 30)
    xs = splines.fit_natural(jnp.asarray(s), jnp.asarray(s - 8.0))
    ys = splines.fit_natural(jnp.asarray(s), jnp.zeros(30))
    ref = build_reference_from_spline(xs, ys, jnp.asarray(12.0), 64, cfg)
    cb = bounds.update_bounds_on_input_states(
        gm, xs, ys, ref, jnp.full((64,), 0.3), cfg)
    nv = int(cb.n_valid)
    assert nv > 10
    assert (np.asarray(cb.front_ub)[:nv - 2] > 3.0).all()
    assert (np.asarray(cb.front_lb)[:nv - 2] < -3.0).all()


def test_dynamic_segmentation_shrinks_spacing_in_curves():
    """enable_dynamic_segmentation: spacing ramps from output_spacing to half
    of it as |k| rises through [0.08, 0.2] (reference_path_impl.cpp:321-335)."""
    cfg = PlannerConfig(n_knots=128, enable_dynamic_segmentation=True)
    # Quarter circle of radius 8 (k = 0.125 -> k_share = 0.375 -> ds = 0.2625)
    t = np.linspace(0, np.pi / 2, 40)
    s_arc = 8.0 * t
    xs = splines.fit_natural(jnp.asarray(s_arc), jnp.asarray(8 * np.sin(t)))
    ys = splines.fit_natural(jnp.asarray(s_arc), jnp.asarray(8 - 8 * np.cos(t)))
    ref = build_reference_from_spline(xs, ys, jnp.asarray(float(s_arc[-1])),
                                      128, cfg)
    nv = int(ref.n_valid)
    ds = np.diff(np.asarray(ref.s)[:nv])
    # Interior spacing must sit near the ramped value, below 0.3.
    assert (ds[2:-2] < 0.29).all() and (ds[2:-2] > 0.2).all()
    np.testing.assert_allclose(ds[5:-5].mean(), 0.2625, atol=0.02)

    # Straight line: dynamic segmentation must reproduce the fixed grid.
    s_l = np.linspace(0, 12, 30)
    xs_l = splines.fit_natural(jnp.asarray(s_l), jnp.asarray(s_l))
    ys_l = splines.fit_natural(jnp.asarray(s_l), jnp.zeros(30))
    ref_l = build_reference_from_spline(xs_l, ys_l, jnp.asarray(12.0), 64,
                                        PlannerConfig(
                                            n_knots=64,
                                            enable_dynamic_segmentation=True))
    nvl = int(ref_l.n_valid)
    np.testing.assert_allclose(np.diff(np.asarray(ref_l.s)[:nvl]), 0.3,
                               atol=1e-3)


def test_directional_prescan_fallback_rescues_bad_hints():
    """PlannerConfig.directional_prescan_fallback: bound extraction fed a
    degraded hint source (arc-length table offset by +8 m — the stale-hint
    failure mode the grid pre-scan exists for) must still project onto the
    path. Pure Newton from the bad hints (the reference mainline's only
    strategy, reference_path_impl.cpp:192-205) strands on EVERY knot of this
    hook-shaped path; the fixed getDirectionalProjection pre-scan
    (splines.project_directional, tools.cpp:128-155 with the :147 min-tracking
    bug fixed) recovers a true ray crossing on every knot."""
    cfg_off = PlannerConfig(n_knots=64)
    cfg_on = PlannerConfig(n_knots=64, directional_prescan_fallback=True)
    res_m, size = 0.2, 300
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res_m
    mask[:, np.abs(yy) >= 25.0] = True
    gm = maps.build_map(jnp.asarray(mask), resolution=res_m)

    t = np.linspace(0.0, 3.6 * np.pi / 2, 80)
    x = 8.0 * np.sin(t)
    y = 8.0 * (1.0 - np.cos(t)) - 8.0
    seg = np.hypot(np.diff(x), np.diff(y))
    s = np.concatenate([[0.0], np.cumsum(seg)])
    xs = splines.fit_natural(jnp.asarray(s, jnp.float32),
                             jnp.asarray(x, jnp.float32))
    ys = splines.fit_natural(jnp.asarray(s, jnp.float32),
                             jnp.asarray(y, jnp.float32))
    ref = build_reference_from_spline(xs, ys, jnp.asarray(float(s[-1]) - 4.0),
                                      64, cfg_off)
    ref_bad = ref.replace(s=ref.s + 8.0)
    nv = int(ref.n_valid)

    cb_off = bounds.update_bounds(gm, xs, ys, ref_bad, cfg_off)
    cb_on = bounds.update_bounds(gm, xs, ys, ref_bad, cfg_on)

    # Per-knot front-axle projection residuals under each strategy.
    rh = np.asarray(ref_bad.heading)[:nv]
    rs = np.asarray(ref_bad.s)[:nv]
    cx = np.asarray(ref_bad.x)[:nv] + cfg_off.front_length * np.cos(rh)
    cy = np.asarray(ref_bad.y)[:nv] + cfg_off.front_length * np.sin(rh)
    ang = rh + np.pi / 2
    max_s = rs + 5.0
    p_newton = splines.project_directional_newton(
        xs, ys, jnp.asarray(cx), jnp.asarray(cy), jnp.asarray(ang),
        jnp.asarray(max_s), jnp.asarray(rs + cfg_off.front_length), 12)
    r_newton = np.asarray(splines.directional_ray_residual(
        xs, ys, jnp.asarray(cx), jnp.asarray(cy), jnp.asarray(ang), p_newton))
    p_scan = splines.project_directional(
        xs, ys, jnp.asarray(cx), jnp.asarray(cy), jnp.asarray(ang),
        jnp.asarray(max_s), start_s=jnp.asarray(np.maximum(rs - 5.0, 0.0)),
        grid=0.5, max_grid_points=21, iters=12)
    r_scan = np.asarray(splines.directional_ray_residual(
        xs, ys, jnp.asarray(cx), jnp.asarray(cy), jnp.asarray(ang), p_scan))

    assert (r_newton > 0.1).sum() > nv // 2, \
        "expected the degraded hints to strand Newton on most knots"
    assert (np.minimum(r_scan, r_newton) < 1e-2).all()
    # And the fallback actually changes the extracted corridor.
    d_ub = np.abs(np.asarray(cb_off.front_ub)[:nv]
                  - np.asarray(cb_on.front_ub)[:nv])
    assert d_ub.max() > 1.0
