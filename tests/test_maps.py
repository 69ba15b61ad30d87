import jax.numpy as jnp
import numpy as np
import scipy.ndimage

from tpu_pathopt import maps


def _random_mask(rng, shape, p=0.02):
    m = rng.random(shape) < p
    m[0, 0] = True  # ensure at least one obstacle
    return m


def test_edt_matches_scipy():
    rng = np.random.default_rng(1)
    mask = _random_mask(rng, (97, 113))
    ours = np.asarray(maps.euclidean_distance_transform(jnp.asarray(mask), chunk=32))
    # scipy: distance of nonzero cells to nearest zero cell -> invert mask
    ref = scipy.ndimage.distance_transform_edt(~mask)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_edt_dense_obstacles():
    rng = np.random.default_rng(2)
    mask = _random_mask(rng, (64, 64), p=0.3)
    ours = np.asarray(maps.euclidean_distance_transform(jnp.asarray(mask)))
    ref = scipy.ndimage.distance_transform_edt(~mask)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_bilinear_lookup_matches_grid_values():
    rng = np.random.default_rng(3)
    mask = _random_mask(rng, (40, 50), p=0.05)
    gm = maps.build_map(jnp.asarray(mask), resolution=0.5)
    esdf = np.asarray(gm.esdf)
    r, c = esdf.shape
    # Exactly at cell centers the lookup equals the grid value.
    for (i, j) in [(0, 0), (5, 7), (20, 30), (r - 1, c - 1)]:
        x = (0.5 * r - 0.5 - i) * 0.5
        y = (0.5 * c - 0.5 - j) * 0.5
        val = float(maps.obstacle_distance(gm, x, y))
        np.testing.assert_allclose(val, esdf[i, j], atol=1e-5)


def test_outside_map_returns_zero():
    gm = maps.build_map(jnp.zeros((10, 10), bool).at[0, 0].set(True), resolution=0.2)
    assert float(maps.obstacle_distance(gm, 100.0, 0.0)) == 0.0
    assert not bool(maps.is_inside(gm, 100.0, 0.0))


def test_padded_map_matches_unpadded():
    """A map padded to a canonical array shape (one shared XLA program for
    all map sizes) must produce bit-identical lookups and inside tests."""
    rng = np.random.default_rng(5)
    mask = _random_mask(rng, (61, 83), p=0.05)
    gm = maps.build_map(jnp.asarray(mask), resolution=0.3)
    gm_pad = maps.build_map(jnp.asarray(mask), resolution=0.3,
                            pad_shape=(128, 96))
    assert gm_pad.esdf.shape == (128, 96)
    assert int(gm_pad.n_rows) == 61 and int(gm_pad.n_cols) == 83
    xs = jnp.asarray(rng.uniform(-12, 12, size=(300,)))
    ys = jnp.asarray(rng.uniform(-15, 15, size=(300,)))
    np.testing.assert_array_equal(
        np.asarray(maps.obstacle_distance(gm, xs, ys)),
        np.asarray(maps.obstacle_distance(gm_pad, xs, ys)))
    np.testing.assert_array_equal(
        np.asarray(maps.is_inside(gm, xs, ys)),
        np.asarray(maps.is_inside(gm_pad, xs, ys)))


def test_lookup_is_batched():
    rng = np.random.default_rng(4)
    mask = _random_mask(rng, (30, 30))
    gm = maps.build_map(jnp.asarray(mask), resolution=0.2)
    xs = jnp.asarray(rng.uniform(-2, 2, size=(4, 5)))
    ys = jnp.asarray(rng.uniform(-2, 2, size=(4, 5)))
    out = maps.obstacle_distance(gm, xs, ys)
    assert out.shape == (4, 5)
