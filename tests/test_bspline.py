import jax.numpy as jnp
import numpy as np
import scipy.interpolate

from tpu_pathopt import bspline


def _clamped_knots(n, p):
    return np.clip((np.arange(n + p + 1) - p) / (n - p), 0.0, 1.0)


def test_de_boor_matches_scipy():
    rng = np.random.default_rng(0)
    n, p = 12, 3
    ctrl = rng.normal(size=(n, 2)).cumsum(axis=0)
    t = np.linspace(0, 1, 50)
    knots = _clamped_knots(n, p)
    ref = scipy.interpolate.BSpline(knots, ctrl, p)(t)
    ours = np.asarray(bspline._de_boor(jnp.asarray(ctrl, jnp.float32),
                                       jnp.asarray(n), p, jnp.asarray(t, jnp.float32)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_de_boor_padded_ctrl():
    rng = np.random.default_rng(1)
    n, p, n_pad = 9, 5, 16
    ctrl = rng.normal(size=(n, 2)).cumsum(axis=0)
    ctrl_pad = np.concatenate([ctrl, np.zeros((n_pad - n, 2))])
    t = np.linspace(0, 1, 33)
    knots = _clamped_knots(n, p)
    ref = scipy.interpolate.BSpline(knots, ctrl, p)(t)
    ours = np.asarray(bspline._de_boor(jnp.asarray(ctrl_pad, jnp.float32),
                                       jnp.asarray(n), p, jnp.asarray(t, jnp.float32)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_fit_and_sample_endpoints():
    # Clamped spline starts/ends at first/last control point.
    pts = np.array([[0.0, 0.0], [10.0, 0.0], [20.0, 5.0], [30.0, 5.0],
                    [40.0, 0.0], [50.0, 0.0]])
    n_pad = 8
    x = np.concatenate([pts[:, 0], np.zeros(n_pad - len(pts))])
    y = np.concatenate([pts[:, 1], np.zeros(n_pad - len(pts))])
    xs, ys, s, n_valid = bspline.fit_and_sample(
        jnp.asarray(x), jnp.asarray(y), len(pts), n_samples=128)
    nv = int(n_valid)
    assert nv <= 128
    np.testing.assert_allclose(float(xs[0]), 0.0, atol=1e-4)
    np.testing.assert_allclose(float(ys[0]), 0.0, atol=1e-4)
    np.testing.assert_allclose(float(xs[nv - 1]), 50.0, atol=1e-3)
    np.testing.assert_allclose(float(ys[nv - 1]), 0.0, atol=1e-3)
    # Arc length is monotone over the valid range and constant after.
    s = np.asarray(s)
    assert np.all(np.diff(s[:nv]) > 0)
    np.testing.assert_allclose(s[nv:], s[nv - 1], atol=1e-6)
