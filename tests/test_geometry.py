import jax.numpy as jnp
import numpy as np

from tpu_pathopt import geometry


def test_constrain_angle():
    angles = np.array([0.0, 3.5, -3.5, 7.0, -7.0, np.pi, -np.pi])
    out = np.asarray(geometry.constrain_angle(jnp.asarray(angles)))
    # Compare modulo 2*pi (the exact +/-pi boundary convention differs from
    # arctan2 but is equivalent for all downstream uses).
    diff = np.arctan2(np.sin(out - angles), np.cos(out - angles))
    np.testing.assert_allclose(diff, 0.0, atol=1e-6)
    assert np.all(out > -np.pi - 1e-6) and np.all(out <= np.pi + 1e-6)


def test_local_global_roundtrip():
    rng = np.random.default_rng(0)
    ref = rng.normal(size=3)
    pts = rng.normal(size=(50, 2))
    gx, gy, gh = geometry.local_to_global(ref[0], ref[1], ref[2],
                                          jnp.asarray(pts[:, 0]),
                                          jnp.asarray(pts[:, 1]), 0.3)
    lx, ly, lh = geometry.global_to_local(ref[0], ref[1], ref[2], gx, gy, gh)
    np.testing.assert_allclose(np.asarray(lx), pts[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ly), pts[:, 1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(lh), 0.3, atol=1e-6)


def test_normal_offset_matches_reference_formula():
    # reference pattern: x + l*cos(h + pi/2), y + l*sin(h + pi/2)
    h = 0.7
    l = 1.3
    x, y = geometry.normal_offset(1.0, 2.0, h, l)
    np.testing.assert_allclose(float(x), 1.0 + l * np.cos(h + np.pi / 2), atol=1e-6)
    np.testing.assert_allclose(float(y), 2.0 + l * np.sin(h + np.pi / 2), atol=1e-6)
