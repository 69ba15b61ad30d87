"""Clamped uniform B-spline evaluation (de Boor), vectorized.

TPU-native replacement for the tinyspline usage in the reference's raw-point
fit (reference: src/reference_path_smoother/reference_path_smoother.cpp:490-524
``bSpline``): the raw clicked points become the control points of a clamped
uniform B-spline of degree 3/4/5 (chosen by average point spacing), which is
then sampled densely along arc length.

The implementation is a fixed-shape de Boor evaluation: control points are
padded to a static maximum with a dynamic valid count, and the degree choice is
a ``lax.switch`` over three statically-unrolled de Boor ladders.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _knot_value(i, degree, denom):
    """Clamped uniform knot value at (possibly out-of-range) index ``i``:
    knot_i = clip((i - degree) / (n_ctrl - degree), 0, 1). Computed
    analytically — the knot vector is never materialized, so the de Boor
    ladder does arithmetic instead of gathers (gathers dominate on TPU)."""
    return jnp.clip((i.astype(jnp.float32) - degree) / denom, 0.0, 1.0)


def _de_boor(ctrl, n_valid, degree: int, t):
    """Evaluate a clamped uniform B-spline at parameters t ∈ [0, 1].

    ctrl: (N, D) padded control points; n_valid: () int32; t: (T,).
    Returns (T, D). Static-degree de Boor ladder, vectorized over t; ONE
    row-gather per query (the (degree+1)-point control window) — knot values
    are analytic (see :func:`_knot_value`).
    """
    n_max, D = ctrl.shape
    denom = jnp.maximum(n_valid - degree, 1).astype(jnp.float32)

    # Knot span: k = degree + floor(t * denom), clamped — equivalent to the
    # searchsorted over the clamped-uniform knot vector.
    k = jnp.clip(jnp.floor(t * denom).astype(jnp.int32) + degree,
                 degree, n_valid - 1)

    # Window table win[m, j] = ctrl[m - degree + j] (zero-padded below 0,
    # clamped indices in the original are never hit for valid spans).
    pad = jnp.zeros((degree, D), ctrl.dtype)
    ctrlp = jnp.concatenate([pad, ctrl])
    win = jnp.stack([ctrlp[j:j + n_max] for j in range(degree + 1)], axis=1)
    d = jnp.take(win, k, axis=0)                       # (T, degree+1, D)

    kf = k
    for r in range(1, degree + 1):
        cols = []
        for j in range(r, degree + 1):
            lo = _knot_value(j + kf - degree, degree, denom)
            hi = _knot_value(j + 1 + kf - r, degree, denom)
            den = hi - lo
            alpha = jnp.where(jnp.abs(den) < 1e-12, 0.0, (t - lo) / den)
            cols.append((1.0 - alpha)[:, None] * d[:, j - 1]
                        + alpha[:, None] * d[:, j])
        d = jnp.concatenate([d[:, :r], jnp.stack(cols, axis=1)], axis=1)
    return d[:, degree]


def fit_and_sample(x, y, n_valid, n_samples: int):
    """Reference ``bSpline()`` semantics (reference_path_smoother.cpp:490-524):

    - control points = the raw input points (padded to static length),
    - degree 3 if average spacing > 10 m, 4 if > 5 m, else 5,
    - sampled at Δt = 1/polyline_length up to t = 1 (so ≈ 1 sample per meter),
      padded/masked to a static ``n_samples``.

    Returns (xs, ys, s, n_samples_valid): sampled points, cumulative arc
    length, and the dynamic number of valid samples.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    n_valid = jnp.asarray(n_valid, jnp.int32)
    ctrl = jnp.stack([x, y], axis=-1)                  # (N, 2)

    idx = jnp.arange(x.shape[0])
    seg_valid = (idx[1:] < n_valid)
    seg_len = jnp.hypot(jnp.diff(x), jnp.diff(y))
    length = jnp.sum(jnp.where(seg_valid, seg_len, 0.0))
    avg = length / jnp.maximum(n_valid - 1, 1)
    degree_idx = jnp.where(avg > 10.0, 0, jnp.where(avg > 5.0, 1, 2))

    # Sample parameters: t_i = i / length for i = 0.. until t >= 1, then exactly 1.
    # (reference samples at delta_t = 1/length and appends t = 1.)
    i = jnp.arange(n_samples, dtype=jnp.float32)
    raw_t = i / jnp.maximum(length, 1.0)
    n_interior = jnp.minimum(
        jnp.ceil(length).astype(jnp.int32), n_samples - 1)
    t = jnp.where(i < n_interior.astype(jnp.float32), raw_t, 1.0)
    n_samp_valid = n_interior + 1

    branches = [lambda c, nv, tt, d=d: _de_boor(c, nv, d, tt) for d in (3, 4, 5)]
    pts = jax.lax.switch(degree_idx, branches, ctrl, n_valid, t)
    xs, ys = pts[:, 0], pts[:, 1]

    seg = jnp.hypot(jnp.diff(xs), jnp.diff(ys))
    samp_idx = jnp.arange(n_samples)
    seg = jnp.where(samp_idx[1:] < n_samp_valid, seg, 0.0)
    s = jnp.concatenate([jnp.zeros((1,), xs.dtype), jnp.cumsum(seg)])
    return xs, ys, s, n_samp_valid
