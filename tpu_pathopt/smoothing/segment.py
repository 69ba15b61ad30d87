"""Resampling of the B-spline-fit raw reference at 1 m spacing.

TPU-native equivalent of ``segmentRawReference`` (reference:
src/reference_path_smoother/reference_path_smoother.cpp:47-85): fit natural
cubic splines x(s), y(s) through the B-spline samples and resample at 1 m with
heading and curvature from the spline derivatives.

Reference quirk kept: the final sample sits at ceil(max_s), i.e. up to 1 m
*past* the fitted range, evaluated by (linear) extrapolation — the reference's
while-loop pushes one step beyond max_s (:62-68).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_pathopt import splines


def segment_raw_reference(x_raw, y_raw, s_raw, n_raw_valid, n_points: int):
    """x_raw/y_raw/s_raw: (Mb,) padded B-spline samples with cumulative arc
    length; returns (x, y, s, angle, k, n_valid) arrays of static length
    ``n_points`` sampled at 1 m."""
    xs = splines.fit_natural(s_raw, x_raw, n_valid=n_raw_valid)
    ys = splines.fit_natural(s_raw, y_raw, n_valid=n_raw_valid)
    max_s = jnp.take(s_raw, n_raw_valid - 1)

    i = jnp.arange(n_points, dtype=jnp.float32)
    n_valid = jnp.minimum(jnp.ceil(max_s).astype(jnp.int32) + 1,
                          jnp.asarray(n_points, jnp.int32))
    # Valid samples at s = 0, 1, ..., n_valid-1; padding holds the last value.
    s = jnp.minimum(i, (n_valid - 1).astype(jnp.float32))
    x = splines.evaluate(xs, s)
    y = splines.evaluate(ys, s)
    angle = splines.heading(xs, ys, s)
    k = splines.curvature(xs, ys, s)
    return x, y, s, angle, k, n_valid
