"""Batched natural cubic splines + Newton projections.

TPU-native replacement for the vendored ``tk::spline``/``band_matrix`` pair
(reference: src/tools/spline.cpp — banded LU at :70-142, coefficients :161-249,
eval :251, deriv :273) and for the projection helpers in src/tools/tools.cpp
(``getProjection`` :66-96, ``getProjectionByNewton`` :98-126,
``getDirectionalProjectionByNewton`` :156-189).

A spline is a pytree of knot arrays + polynomial coefficients with a validity
count, so a fixed-shape (padded) representation serves a whole batch under one
compilation. The natural-BC tridiagonal system is solved with a Thomas scan
(``lax.scan``) — sequential over knots, vmapped over batch; matches
``scipy.interpolate.CubicSpline(bc_type='natural')`` to float tolerance.
Out-of-range queries extrapolate *linearly* (natural BC ⇒ zero end curvature),
which is what tk::spline does and what the reference relies on when it
evaluates 3 m past the fitted range (tension_smoother.cpp:40).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class CubicSpline:
    """Piecewise cubic y(s) = y_i + c_i t + b_i t^2 + a_i t^3, t = s - s_i on
    [s_i, s_{i+1}]. Arrays have static length N (padded); ``n_valid`` counts
    real knots. Padded knots continue the last segment linearly."""

    s: jax.Array        # (N,) knot positions, strictly increasing
    y: jax.Array        # (N,) values at knots
    a: jax.Array        # (N-1,)
    b: jax.Array        # (N-1,)
    c: jax.Array        # (N-1,)
    n_valid: jax.Array  # () int32

    @property
    def s_max(self):
        return jnp.take(self.s, self.n_valid - 1)


def _thomas(lower, diag, upper, rhs):
    """Tridiagonal solve (Thomas algorithm) via parallel prefix scans.

    All inputs (n,); lower[0] and upper[-1] are ignored. Instead of two
    n-step sequential sweeps (2n XLA While iterations — pure loop latency on
    TPU), the three recurrences run as ``associative_scan``s in log2(n)
    elementwise levels:

    - the elimination coefficients c'_i = up_i / (dg_i - lo_i c'_{i-1}) form
      a Moebius chain -> scan over normalized 2x2 matrix products;
    - d'_i = (r_i - lo_i d'_{i-1}) / t_i and the back substitution
      x_i = d'_i - c'_i x_{i+1} are affine chains -> scans over (a, b) pairs.

    Same math, different summation order; the natural-spline systems here are
    diagonally dominant, so the normalized products are stable.
    """
    lo = lower.at[0].set(0.0)

    def mobius(l, r):
        a1, b1, c1, d1 = l
        a2, b2, c2, d2 = r
        a = a2 * a1 + b2 * c1
        b = a2 * b1 + b2 * d1
        c = c2 * a1 + d2 * c1
        d = c2 * b1 + d2 * d1
        s = jnp.maximum(jnp.maximum(jnp.abs(a), jnp.abs(b)),
                        jnp.maximum(jnp.abs(c), jnp.abs(d)))
        s = jnp.maximum(s, 1e-30)
        return a / s, b / s, c / s, d / s

    zeros = jnp.zeros_like(diag)
    m = jax.lax.associative_scan(
        mobius, (zeros, upper, -lo, diag))
    cp = m[1] / jnp.where(jnp.abs(m[3]) < 1e-30, 1e-30, m[3])

    cp_prev = jnp.concatenate([jnp.zeros_like(cp[:1]), cp[:-1]])
    t = diag - lo * cp_prev

    def affine(l, r):
        a1, b1 = l
        a2, b2 = r
        return a2 * a1, a2 * b1 + b2

    _, dp = jax.lax.associative_scan(affine, (-lo / t, rhs / t))
    _, xs = jax.lax.associative_scan(affine, (-cp, dp), reverse=True)
    return xs


def fit_natural(s, y, n_valid=None) -> CubicSpline:
    """Fit a natural cubic spline through (s, y). ``s`` must be strictly
    increasing over the first ``n_valid`` entries; entries beyond are padding
    (any increasing continuation works — see ``pad_polyline``)."""
    s = jnp.asarray(s)
    y = jnp.asarray(y)
    n = s.shape[0]
    if n_valid is None:
        n_valid = jnp.asarray(n, jnp.int32)
    n_valid = jnp.asarray(n_valid, jnp.int32)

    h = jnp.diff(s)                                  # (n-1,)
    slope = jnp.diff(y) / h                          # (n-1,)

    # Interior equations for second derivatives sigma_i, i = 1..n-2:
    #   h_{i-1} sig_{i-1} + 2(h_{i-1}+h_i) sig_i + h_i sig_{i+1}
    #     = 6 (slope_i - slope_{i-1})
    # Natural BC (sig_0 = sig_{n-1} = 0) and masked rows become identity rows.
    idx = jnp.arange(n)
    interior = (idx >= 1) & (idx <= n_valid - 2)
    h_im1 = jnp.concatenate([h[:1], h])              # h_{i-1} aligned to i (pad i=0)
    h_i = jnp.concatenate([h, h[-1:]])               # h_i aligned to i (pad i=n-1)
    slope_i = jnp.concatenate([slope, slope[-1:]])
    slope_im1 = jnp.concatenate([slope[:1], slope])

    diag = jnp.where(interior, 2.0 * (h_im1 + h_i), 1.0)
    lower = jnp.where(interior, h_im1, 0.0)
    upper = jnp.where(interior, h_i, 0.0)
    rhs = jnp.where(interior, 6.0 * (slope_i - slope_im1), 0.0)
    # Zero coupling into non-interior rows from neighbors:
    lower = jnp.where(jnp.roll(interior, 0), lower, 0.0)
    sigma = _thomas(lower, diag, upper, rhs)
    sigma = jnp.where(interior, sigma, 0.0)          # natural ends + padding

    sig_i = sigma[:-1]
    sig_ip1 = sigma[1:]
    a = (sig_ip1 - sig_i) / (6.0 * h)
    b = sig_i / 2.0
    c = slope - h * (2.0 * sig_i + sig_ip1) / 6.0
    return CubicSpline(s=s, y=y, a=a, b=b, c=c, n_valid=n_valid)


def _segment_index(sp: CubicSpline, q):
    """Index of the segment containing q, clipped to valid segments.

    Computed as a broadcast compare + lane reduction rather than
    ``jnp.searchsorted``: XLA lowers searchsorted to a binary-search While of
    ~log2(N) *dependent* gathers, which is pure latency on TPU — inside the
    Newton projection loops that chain made the segment lookup the single
    hottest op of the whole pipeline. The compare-reduce is one fused
    vector op (knot tables here are <= a few hundred entries, so the O(N)
    extra compares are free on the VPU)."""
    q = jnp.asarray(q)
    i = jnp.sum((q[..., None] >= sp.s).astype(jnp.int32), axis=-1) - 1
    return jnp.clip(i, 0, sp.n_valid - 2)


_ONEHOT_MAX_ROWS = 512


def _select_rows(tbl, i):
    """``tbl[i]`` for small tables as a one-hot multiply-reduce instead of a
    gather. TPU gathers run at ~0.1-0.3 G indices/s regardless of row width;
    a (Q, K) one-hot mask against K <= a few hundred rows is a fused VPU
    broadcast-compare + reduce that costs effectively nothing — inside the
    Newton projection loops the per-iteration coefficient gathers dominated
    the whole bounds stage. Exact: each output sums ONE selected term, so
    results are bit-identical to the gather. The select is a ``where`` (not
    a 0/1 multiply): rows beyond a padded spline's valid extent may hold
    non-finite coefficients, and 0 * inf would poison every query.

    (An MXU variant — one-hot f32 matmul against an isfinite-scrubbed
    table — measured inside the ~3% tunnel drift vs this where-reduce on
    the B=512/1024 sweeps and was removed per the measured-negatives rule;
    see PERF.md round-5 notes before reintroducing.)"""
    K = tbl.shape[0]
    oh = i[..., None] == jnp.arange(K, dtype=i.dtype)
    return jnp.sum(jnp.where(oh[..., None], tbl, jnp.zeros_like(tbl)),
                   axis=-2)


def evaluate(sp: CubicSpline, q, order: int = 0):
    """Evaluate the spline (order=0) or its derivative (order=1, 2) at q.
    Linear extrapolation beyond the valid range (tk::spline natural-BC
    behavior, spline.cpp:251-299)."""
    q = jnp.asarray(q)
    i = _segment_index(sp, q)
    nseg = sp.a.shape[0]
    if nseg <= _ONEHOT_MAX_ROWS:
        seg_tbl = jnp.stack([sp.s[:nseg], sp.y[:nseg], sp.a, sp.b, sp.c],
                            axis=-1)
        row = _select_rows(seg_tbl, i)
        t = q - row[..., 0]
        y0, a, b, c = row[..., 1], row[..., 2], row[..., 3], row[..., 4]
    else:
        t = q - jnp.take(sp.s, i)
        a = jnp.take(sp.a, i)
        b = jnp.take(sp.b, i)
        c = jnp.take(sp.c, i)
        y0 = jnp.take(sp.y, i)

    s_lo = sp.s[0]
    s_hi = sp.s_max
    below = q < s_lo
    above = q > s_hi

    if order == 0:
        val = y0 + t * (c + t * (b + t * a))
        # Linear extension with the end slopes.
        lo_val = sp.y[0] + sp.c[0] * (q - s_lo)
        hi_i = sp.n_valid - 2
        h_end = jnp.take(sp.s, sp.n_valid - 1) - jnp.take(sp.s, hi_i)
        end_slope = (jnp.take(sp.c, hi_i) + 2.0 * jnp.take(sp.b, hi_i) * h_end
                     + 3.0 * jnp.take(sp.a, hi_i) * h_end ** 2)
        hi_val = jnp.take(sp.y, sp.n_valid - 1) + end_slope * (q - s_hi)
        return jnp.where(below, lo_val, jnp.where(above, hi_val, val))
    elif order == 1:
        val = c + t * (2.0 * b + 3.0 * a * t)
        lo_val = sp.c[0]
        hi_i = sp.n_valid - 2
        h_end = jnp.take(sp.s, sp.n_valid - 1) - jnp.take(sp.s, hi_i)
        hi_val = (jnp.take(sp.c, hi_i) + 2.0 * jnp.take(sp.b, hi_i) * h_end
                  + 3.0 * jnp.take(sp.a, hi_i) * h_end ** 2)
        return jnp.where(below, lo_val, jnp.where(above, hi_val, val))
    elif order == 2:
        val = 2.0 * b + 6.0 * a * t
        return jnp.where(below | above, 0.0, val)
    raise ValueError(f"order must be 0, 1 or 2, got {order}")


def heading(xs: CubicSpline, ys: CubicSpline, q):
    """Tangent direction of the curve (x(s), y(s)) (reference: tools.cpp:32-36)."""
    return jnp.arctan2(evaluate(ys, q, 1), evaluate(xs, q, 1))


def curvature(xs: CubicSpline, ys: CubicSpline, q):
    """Signed curvature (reference: tools.cpp:38-44)."""
    dx = evaluate(xs, q, 1)
    dy = evaluate(ys, q, 1)
    ddx = evaluate(xs, q, 2)
    ddy = evaluate(ys, q, 2)
    return (dx * ddy - dy * ddx) / (dx * dx + dy * dy) ** 1.5


def pad_arclength(s, n_valid, step: float = 1.0):
    """Make a (possibly constant-padded) arc-length array strictly increasing
    beyond ``n_valid`` so spline fitting stays well-defined on padding."""
    i = jnp.arange(s.shape[0])
    s_max = jnp.take(s, n_valid - 1)
    return jnp.where(i < n_valid, s,
                     s_max + step * (i - n_valid + 1).astype(s.dtype))


def pad_polyline(x, y, n_pad: int):
    """Pad a polyline (numpy-side helper is in cli; this one is jax) to length
    n_pad by continuing the last segment direction with the last spacing.
    Returns (x, y, s, n_valid) with s the cumulative arc length."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    assert n_pad >= n
    dx = x[-1] - x[-2]
    dy = y[-1] - y[-2]
    extra = jnp.arange(1, n_pad - n + 1, dtype=x.dtype)
    x_pad = jnp.concatenate([x, x[-1] + extra * dx])
    y_pad = jnp.concatenate([y, y[-1] + extra * dy])
    seg = jnp.hypot(jnp.diff(x_pad), jnp.diff(y_pad))
    seg = jnp.maximum(seg, 1e-6)
    s = jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(seg)])
    return x_pad, y_pad, s, jnp.asarray(n, jnp.int32)


# ---------------------------------------------------------------------------
# Fused paired-curve evaluation. The planar curve (x(s), y(s)) is two splines
# over the SAME knot vector; Newton projection loops need
# (x, y, x', y', x'', y'') every iteration. Evaluating the splines separately
# costs ~6 searchsorted + ~30 coefficient gathers per iteration — on TPU the
# gathers dominate the whole bound-extraction stage. The fused path packs both
# splines' segment coefficients into one (N-1, 8) table: per query it is ONE
# searchsorted + ONE row-gather + polynomial arithmetic.
# ---------------------------------------------------------------------------


def pack_xy(xs: CubicSpline, ys: CubicSpline):
    """Packed per-segment coefficient table [x0, xa, xb, xc, y0, ya, yb, yc]
    for :func:`eval_xy_fused`. Requires xs and ys to share the knot vector
    (true for every curve built by arc-length refitting)."""
    return jnp.stack([xs.y[:-1], xs.a, xs.b, xs.c,
                      ys.y[:-1], ys.a, ys.b, ys.c], axis=-1)


def eval_xy_fused(xs: CubicSpline, ys: CubicSpline, tbl, q):
    """(x, y, dx, dy, ddx, ddy) at q — semantics identical to six
    :func:`evaluate` calls (incl. linear extrapolation), one gather."""
    q = jnp.asarray(q)
    i = _segment_index(xs, q)
    nseg = tbl.shape[0]
    if nseg <= _ONEHOT_MAX_ROWS:
        # One-hot multiply-reduce beats the gather for these small tables
        # (see _select_rows); fold the knot s column in so the whole segment
        # state is one select.
        row = _select_rows(jnp.concatenate([xs.s[:nseg, None], tbl], axis=-1),
                           i)
        t = q - row[..., 0]
        row = row[..., 1:]
    else:
        t = q - jnp.take(xs.s, i)
        row = jnp.take(tbl, i, axis=0)
    x0, xa, xb, xc = row[..., 0], row[..., 1], row[..., 2], row[..., 3]
    y0, ya, yb, yc = row[..., 4], row[..., 5], row[..., 6], row[..., 7]

    s_lo = xs.s[0]
    s_hi = xs.s_max
    below = q < s_lo
    above = q > s_hi
    out_of = below | above

    # End-slope scalars (once per call, not per query).
    hi_i = xs.n_valid - 2
    h_end = jnp.take(xs.s, xs.n_valid - 1) - jnp.take(xs.s, hi_i)

    def end_slope(sp):
        return (jnp.take(sp.c, hi_i) + 2.0 * jnp.take(sp.b, hi_i) * h_end
                + 3.0 * jnp.take(sp.a, hi_i) * h_end ** 2)

    x_hi_slope = end_slope(xs)
    y_hi_slope = end_slope(ys)
    x_hi_val = jnp.take(xs.y, xs.n_valid - 1)
    y_hi_val = jnp.take(ys.y, ys.n_valid - 1)

    def one(v0, a, b, c, lo_val0, lo_slope, hi_val, hi_slope):
        val = v0 + t * (c + t * (b + t * a))
        d1 = c + t * (2.0 * b + 3.0 * a * t)
        d2 = 2.0 * b + 6.0 * a * t
        lo_val = lo_val0 + lo_slope * (q - s_lo)
        hi_v = hi_val + hi_slope * (q - s_hi)
        val = jnp.where(below, lo_val, jnp.where(above, hi_v, val))
        d1 = jnp.where(below, lo_slope, jnp.where(above, hi_slope, d1))
        d2 = jnp.where(out_of, 0.0, d2)
        return val, d1, d2

    x, dx, ddx = one(x0, xa, xb, xc, xs.y[0], xs.c[0], x_hi_val, x_hi_slope)
    y, dy, ddy = one(y0, ya, yb, yc, ys.y[0], ys.c[0], y_hi_val, y_hi_slope)
    return x, y, dx, dy, ddx, ddy


# ---------------------------------------------------------------------------
# Projections (reference: tools.cpp:66-189)
# ---------------------------------------------------------------------------

def project_newton(xs: CubicSpline, ys: CubicSpline, tx, ty, max_s, hint_s,
                   iters: int = 20):
    """Closest-point projection of (tx, ty) onto the curve by Newton iteration
    from hint_s (reference: getProjectionByNewton, tools.cpp:98-126). Returns s.
    Vectorized over any common leading shape."""
    tbl = pack_xy(xs, ys)
    cur = jnp.minimum(hint_s, max_s)

    def body(_, cur):
        x, y, dx, dy, ddx, ddy = eval_xy_fused(xs, ys, tbl, cur)
        jcb = (x - tx) * dx + (y - ty) * dy
        hes = dx * dx + (x - tx) * ddx + dy * dy + (y - ty) * ddy
        return cur - jcb / jnp.where(jnp.abs(hes) < 1e-12, 1e-12, hes)

    cur = jax.lax.fori_loop(0, iters, body, cur)
    return jnp.minimum(cur, max_s)


def project(xs: CubicSpline, ys: CubicSpline, tx, ty, max_s, start_s=0.0,
            grid: float = 1.0, max_grid_points: int = 256, iters: int = 20):
    """Grid pre-scan at `grid` spacing followed by Newton refinement
    (reference: getProjection, tools.cpp:66-96). Fixed-shape: scans
    ``max_grid_points`` candidates masked to [start_s, max_s]."""
    cand = start_s + grid * jnp.arange(max_grid_points, dtype=jnp.float32)
    valid = cand <= max_s
    cx = evaluate(xs, cand)
    cy = evaluate(ys, cand)
    d2 = (cx - tx) ** 2 + (cy - ty) ** 2
    d2 = jnp.where(valid, d2, jnp.inf)
    best = cand[jnp.argmin(d2)]
    return project_newton(xs, ys, tx, ty, max_s, best, iters=iters)


def project_directional(xs: CubicSpline, ys: CubicSpline, tx, ty, angle,
                        max_s, start_s=0.0, grid: float = 1.0,
                        max_grid_points: int = 256, iters: int = 20):
    """Directional projection with a bounded grid pre-scan before the Newton
    polish (reference: getDirectionalProjection, tools.cpp:128-155): scan
    ``max_grid_points`` candidates from ``start_s`` at ``grid`` spacing for
    the point of minimum |signed ray distance|, then Newton from the winner.

    The reference's grid scan contains a swapped assignment
    (``tmp_dot_value = min_dot_value;``, tools.cpp:147) so its minimum never
    updates and the result degenerates to Newton from the *last* grid point;
    the reference mainline is unaffected because updateBoundsImproved calls
    the Newton variant directly (reference_path_impl.cpp:192-205). Implemented
    here with the min tracking FIXED (documented divergence, SURVEY.md §7) —
    this is the robust fallback when a Newton hint is far from the optimum.
    Vectorized over any common leading shape of (tx, ty, angle, max_s,
    start_s)."""
    tx = jnp.asarray(tx)
    ty = jnp.asarray(ty)
    angle = jnp.asarray(angle)
    max_s = jnp.asarray(max_s)
    offs = grid * jnp.arange(max_grid_points, dtype=jnp.float32)
    cand = jnp.asarray(start_s)[..., None] + offs      # (..., G)
    valid = cand <= max_s[..., None]
    cand = jnp.clip(cand, 0.0, max_s[..., None])
    cx = evaluate(xs, cand)
    cy = evaluate(ys, cand)
    v1 = jnp.sin(angle)[..., None]
    v2 = -jnp.cos(angle)[..., None]
    ray_dist = jnp.abs(v1 * (cx - tx[..., None]) + v2 * (cy - ty[..., None]))
    ray_dist = jnp.where(valid, ray_dist, jnp.inf)
    best = jnp.take_along_axis(cand, jnp.argmin(ray_dist, axis=-1)[..., None],
                               axis=-1)[..., 0]
    return project_directional_newton(xs, ys, tx, ty, angle, max_s, best,
                                      iters=iters)


def directional_ray_residual(xs: CubicSpline, ys: CubicSpline, tx, ty, angle,
                             s):
    """|signed distance of the curve point at s from the ray through (tx, ty)
    along `angle`| — 0 at a true directional projection. Used to grade Newton
    results (bounds.py fallback selection)."""
    tbl = pack_xy(xs, ys)
    x, y, *_ = eval_xy_fused(xs, ys, tbl, s)
    return jnp.abs(jnp.sin(angle) * (x - tx) - jnp.cos(angle) * (y - ty))


def project_directional_newton(xs: CubicSpline, ys: CubicSpline, tx, ty, angle,
                               max_s, hint_s, iters: int = 20):
    """Projection along the ray through (tx, ty) with direction `angle`:
    minimizes the squared signed distance of the curve point from that ray
    (reference: getDirectionalProjectionByNewton, tools.cpp:156-189).
    Vectorized over any common leading shape of (tx, ty, angle, max_s, hint_s);
    fused single-gather evaluation per iteration."""
    tbl = pack_xy(xs, ys)
    v1 = jnp.sin(angle)
    v2 = -jnp.cos(angle)
    cur = jnp.minimum(hint_s, max_s)

    def body(_, cur):
        x, y, dx, dy, ddx, ddy = eval_xy_fused(xs, ys, tbl, cur)
        p1 = v1 * (x - tx) + v2 * (y - ty)
        p2 = v1 * dx + v2 * dy
        jcb = p1 * p2
        hes = p1 * (v1 * ddx + v2 * ddy) + p2 * p2
        return cur - jcb / jnp.where(jnp.abs(hes) < 1e-12, 1e-12, hes)

    cur = jax.lax.fori_loop(0, iters, body, cur)
    return jnp.minimum(cur, max_s)
