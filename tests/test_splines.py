import jax
import jax.numpy as jnp
import numpy as np
import scipy.interpolate

from tpu_pathopt import splines


def _fit_pair(rng, n=20):
    s = np.sort(rng.uniform(0, 30, size=n))
    s[0] = 0.0
    s = np.unique(s)
    while len(s) < n:
        s = np.append(s, s[-1] + 1.0)
    y = rng.normal(size=n).cumsum()
    return s, y


def test_fit_matches_scipy_natural():
    rng = np.random.default_rng(0)
    s, y = _fit_pair(rng)
    sp = splines.fit_natural(jnp.asarray(s, jnp.float64), jnp.asarray(y, jnp.float64))
    ref = scipy.interpolate.CubicSpline(s, y, bc_type="natural")
    q = np.linspace(s[0], s[-1], 200)
    for order in (0, 1, 2):
        ours = np.asarray(splines.evaluate(sp, jnp.asarray(q), order))
        np.testing.assert_allclose(ours, ref(q, order), rtol=1e-4, atol=1e-4)


def test_padded_fit_matches_unpadded():
    rng = np.random.default_rng(1)
    s, y = _fit_pair(rng, n=15)
    sp_full = splines.fit_natural(jnp.asarray(s), jnp.asarray(y))
    # Pad to 25 knots with linear continuation
    extra = np.arange(1, 11) * 2.0
    s_pad = np.concatenate([s, s[-1] + extra])
    y_pad = np.concatenate([y, y[-1] + extra * 0.5])
    sp_pad = splines.fit_natural(jnp.asarray(s_pad), jnp.asarray(y_pad),
                                 n_valid=len(s))
    q = np.linspace(0, s[-1], 100)
    np.testing.assert_allclose(
        np.asarray(splines.evaluate(sp_pad, jnp.asarray(q))),
        np.asarray(splines.evaluate(sp_full, jnp.asarray(q))), atol=1e-4)


def test_linear_extrapolation():
    s = np.array([0.0, 1.0, 2.0, 3.0])
    y = np.array([0.0, 1.0, 0.0, 1.0])
    sp = splines.fit_natural(jnp.asarray(s), jnp.asarray(y))
    # Beyond the end: linear with end slope; second derivative zero.
    q = jnp.asarray([4.0, 5.0])
    v = np.asarray(splines.evaluate(sp, q))
    d = np.asarray(splines.evaluate(sp, q, 1))
    dd = np.asarray(splines.evaluate(sp, q, 2))
    assert np.allclose(d, d[0], atol=1e-5)          # constant slope
    np.testing.assert_allclose(v[1] - v[0], d[0] * 1.0, atol=1e-4)
    np.testing.assert_allclose(dd, 0.0, atol=1e-6)


def test_heading_curvature_on_circle():
    # Circle of radius R: curvature = 1/R everywhere.
    R = 10.0
    t = np.linspace(0, np.pi, 80)
    s = R * t
    x = R * np.cos(t)
    y = R * np.sin(t)
    xs = splines.fit_natural(jnp.asarray(s), jnp.asarray(x))
    ys = splines.fit_natural(jnp.asarray(s), jnp.asarray(y))
    q = jnp.asarray(np.linspace(2.0, s[-1] - 2.0, 50))
    k = np.asarray(splines.curvature(xs, ys, q))
    np.testing.assert_allclose(k, 1.0 / R, rtol=2e-2)
    h = np.asarray(splines.heading(xs, ys, q))
    # Tangent of ccw circle at angle t is t + pi/2 (compare modulo 2*pi).
    expect = np.asarray(q) / R + np.pi / 2
    diff = np.arctan2(np.sin(h - expect), np.cos(h - expect))
    np.testing.assert_allclose(diff, 0.0, atol=2e-2)


def test_projection_newton():
    # Straight line y = 0: projection of (tx, ty) is s = tx.
    s = np.arange(30.0)
    xs = splines.fit_natural(jnp.asarray(s), jnp.asarray(s))
    ys = splines.fit_natural(jnp.asarray(s), jnp.asarray(np.zeros_like(s)))
    p = float(splines.project(xs, ys, 12.3, 4.0, 29.0))
    np.testing.assert_allclose(p, 12.3, atol=1e-3)


def test_directional_projection():
    # Curve along x-axis; ray from (5, -2) at angle pi/2 (pointing +y) hits s=5.
    s = np.arange(30.0)
    xs = splines.fit_natural(jnp.asarray(s), jnp.asarray(s))
    ys = splines.fit_natural(jnp.asarray(s), jnp.asarray(np.zeros_like(s)))
    p = float(splines.project_directional_newton(
        xs, ys, 5.0, -2.0, np.pi / 2, 29.0, 8.0))
    np.testing.assert_allclose(p, 5.0, atol=1e-3)


def test_fit_is_vmappable():
    rng = np.random.default_rng(2)
    batch_s, batch_y = [], []
    for _ in range(4):
        s, y = _fit_pair(rng, n=12)
        batch_s.append(s)
        batch_y.append(y)
    bs = jnp.asarray(np.stack(batch_s))
    by = jnp.asarray(np.stack(batch_y))
    sps = jax.vmap(splines.fit_natural)(bs, by)
    assert sps.a.shape == (4, 11)
    q = jnp.asarray(np.linspace(0, 5, 7))
    vals = jax.vmap(lambda sp: splines.evaluate(sp, q))(sps)
    assert vals.shape == (4, 7)


def test_newton_12_iters_reaches_20_iter_fixed_point():
    """config.newton_iters = 12 vs the reference's hardcoded 20
    (tools.cpp:107): on strongly curved splines, both directional and
    closest-point Newton must land on the same f32 fixed point — the extra
    8 passes are pure latency. Demonstrates the claim argued in
    config.py:80-85 instead of leaving it as a comment."""
    # Curvy path: radius ~5 m S-bends (|k| ~ 0.2, near the planner's limit).
    t = np.linspace(0, 30, 40)
    x = t
    y = 4.0 * np.sin(t / 4.0) + 1.5 * np.sin(t / 2.0)
    seg = np.hypot(np.diff(x), np.diff(y))
    s = np.concatenate([[0.0], np.cumsum(seg)])
    xs = splines.fit_natural(jnp.asarray(s, jnp.float32),
                             jnp.asarray(x, jnp.float32))
    ys = splines.fit_natural(jnp.asarray(s, jnp.float32),
                             jnp.asarray(y, jnp.float32))
    max_s = float(s[-1])

    rng = np.random.default_rng(7)
    hint = jnp.asarray(rng.uniform(0, max_s, size=64), jnp.float32)
    # Off-curve query points around the hints (lateral offsets up to 2.5 m).
    hx = np.asarray(splines.evaluate(xs, hint))
    hy = np.asarray(splines.evaluate(ys, hint))
    ang = np.asarray(splines.heading(xs, ys, hint)) + np.pi / 2
    off = rng.uniform(-2.5, 2.5, size=64).astype(np.float32)
    tx = jnp.asarray(hx + off * np.cos(ang))
    ty = jnp.asarray(hy + off * np.sin(ang))
    angj = jnp.asarray(ang, jnp.float32)
    max_sj = jnp.full((64,), max_s, jnp.float32)

    s12 = splines.project_newton(xs, ys, tx, ty, max_sj, hint, iters=12)
    s20 = splines.project_newton(xs, ys, tx, ty, max_sj, hint, iters=20)
    np.testing.assert_allclose(np.asarray(s12), np.asarray(s20),
                               atol=1e-4, rtol=0)

    d12 = splines.project_directional_newton(xs, ys, tx, ty, angj, max_sj,
                                             hint, iters=12)
    d20 = splines.project_directional_newton(xs, ys, tx, ty, angj, max_sj,
                                             hint, iters=20)
    np.testing.assert_allclose(np.asarray(d12), np.asarray(d20),
                               atol=1e-4, rtol=0)


def _hook_pair(dtype=jnp.float32):
    """A curve that doubles back in x (a hook): x(s) is non-monotone, so the
    ray-crossing equation p1(s) = 0 has multiple roots and Newton from a bad
    hint lands far from any of them."""
    t = np.linspace(0.0, 3.6 * np.pi / 2, 60)
    x = 8.0 * np.sin(t)                      # rises to 8, folds back
    y = 8.0 * (1.0 - np.cos(t))
    seg = np.hypot(np.diff(x), np.diff(y))
    s = np.concatenate([[0.0], np.cumsum(seg)])
    xs = splines.fit_natural(jnp.asarray(s, dtype), jnp.asarray(x, dtype))
    ys = splines.fit_natural(jnp.asarray(s, dtype), jnp.asarray(y, dtype))
    return xs, ys, float(s[-1])


def test_directional_prescan_matches_brute_force():
    """project_directional (grid pre-scan + Newton, the reference's
    getDirectionalProjection with its tools.cpp:147 min-tracking bug FIXED)
    must land on the brute-force minimum-|ray distance| point."""
    xs, ys, max_s = _hook_pair()
    tx, ty, angle = 5.0, -2.0, np.pi / 2     # vertical ray x = 5
    p = float(splines.project_directional(xs, ys, tx, ty, angle, max_s,
                                          grid=1.0, max_grid_points=64))
    # Brute force on a dense grid + the residual must be ~0 (a true crossing).
    dense = np.linspace(0.0, max_s, 20001)
    rx = np.asarray(splines.evaluate(xs, jnp.asarray(dense, jnp.float32)))
    res_dense = np.abs(rx - tx)              # ray distance for this geometry
    r_p = float(splines.directional_ray_residual(
        xs, ys, tx, ty, angle, jnp.asarray(p)))
    assert r_p < 1e-2
    # p is one of the dense near-minima (within one grid-refinement step).
    near = dense[res_dense < 5e-2]
    assert near.size and np.min(np.abs(near - p)) < 0.05


def test_directional_newton_bad_hint_rescued_by_prescan():
    """From a hint on the folded-back branch, pure Newton strands far from
    the ray (the failure mode the pre-scan exists for); the pre-scan variant
    recovers a true crossing."""
    xs, ys, max_s = _hook_pair()
    tx, ty, angle = 5.0, -2.0, np.pi / 2
    bad_hint = 0.75 * max_s                  # deep in the fold
    p_newton = splines.project_directional_newton(
        xs, ys, tx, ty, angle, max_s, bad_hint, iters=12)
    r_newton = float(splines.directional_ray_residual(
        xs, ys, tx, ty, angle, p_newton))
    p_scan = splines.project_directional(
        xs, ys, tx, ty, angle, max_s, grid=1.0, max_grid_points=64, iters=12)
    r_scan = float(splines.directional_ray_residual(
        xs, ys, tx, ty, angle, p_scan))
    assert r_newton > 0.1, "expected the bad hint to strand Newton"
    assert r_scan < 1e-2


def test_segment_select_ignores_nonfinite_padding():
    """Padded splines can carry non-finite coefficients beyond n_valid (the
    pipeline's arc-length refits do); the one-hot segment select must not
    let them poison valid queries — a 0/1 *multiply* mask would turn
    0 * inf into NaN for every query (caught as ok_fraction=0 end-to-end)."""
    import jax
    import jax.numpy as jnp

    s = jnp.asarray(np.linspace(0.0, 5.0, 8), jnp.float32)
    y = jnp.asarray(np.cos(np.linspace(0.0, 5.0, 8)), jnp.float32)
    sp = splines.fit_natural(s, y, n_valid=jnp.asarray(6, jnp.int32))
    # Poison the padded segments explicitly.
    bad = jnp.asarray([0, 0, 0, 0, 0, np.inf, np.nan], jnp.float32)
    sp_bad = sp.replace(a=sp.a + bad, b=sp.b + bad, c=sp.c + bad)

    q = jnp.asarray(np.linspace(0.0, float(sp.s[5]), 17), jnp.float32)
    clean = np.asarray(jax.jit(splines.evaluate)(sp, q))
    got = np.asarray(jax.jit(splines.evaluate)(sp_bad, q))
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got, clean)

    tbl = splines.pack_xy(sp_bad, sp_bad)
    out = jax.jit(splines.eval_xy_fused)(sp_bad, sp_bad, tbl, q)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
