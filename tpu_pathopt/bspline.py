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


def _clamped_knots(n_ctrl, degree, n_max_knots):
    """Clamped uniform knot vector of a B-spline with ``n_ctrl`` (dynamic)
    control points, padded to ``n_max_knots`` entries (padding = 1.0).
    knot_i = clip((i - degree) / (n_ctrl - degree), 0, 1)."""
    i = jnp.arange(n_max_knots, dtype=jnp.float32)
    denom = jnp.maximum(n_ctrl - degree, 1).astype(jnp.float32)
    return jnp.clip((i - degree) / denom, 0.0, 1.0)


def _de_boor(ctrl, n_valid, degree: int, t):
    """Evaluate a clamped uniform B-spline at parameters t ∈ [0, 1].

    ctrl: (N, D) padded control points; n_valid: () int32; t: (T,).
    Returns (T, D). Static-degree de Boor ladder, vectorized over t.
    """
    n_max = ctrl.shape[0]
    knots = _clamped_knots(n_valid, degree, n_max + degree + 1)

    # Knot span k: knots[k] <= t < knots[k+1], clamped to valid range.
    k = jnp.searchsorted(knots, t, side="right") - 1
    k = jnp.clip(k, degree, n_valid - 1)

    def eval_one(tq, kq):
        # d_j = ctrl[j + kq - degree] for j = 0..degree
        idx = kq - degree + jnp.arange(degree + 1)
        d = ctrl[jnp.clip(idx, 0, n_max - 1)]          # (degree+1, D)
        for r in range(1, degree + 1):
            new_d = [d[i] for i in range(r)]
            for j in range(r, degree + 1):
                lo = knots[jnp.clip(j + kq - degree, 0, knots.shape[0] - 1)]
                hi = knots[jnp.clip(j + 1 + kq - r, 0, knots.shape[0] - 1)]
                denom = hi - lo
                alpha = jnp.where(jnp.abs(denom) < 1e-12, 0.0, (tq - lo) / denom)
                new_d.append((1.0 - alpha) * d[j - 1] + alpha * d[j])
            d = jnp.stack(new_d)
        return d[degree]

    return jax.vmap(eval_one)(t, k)


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
