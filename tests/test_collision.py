import jax.numpy as jnp
import numpy as np

from tpu_pathopt import collision, maps
from tpu_pathopt.config import PlannerConfig

CFG = PlannerConfig()


def _open_map_with_block():
    res, size = 0.2, 200
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res
    xx = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[np.ix_((xx >= 5) & (xx <= 8), (yy >= -2) & (yy <= 2))] = True
    return maps.build_map(jnp.asarray(mask), resolution=res)


def test_geometry_covers_footprint():
    car = collision.make_car_geometry(CFG)
    # The covering circles must contain the four footprint corners.
    corners = np.array([
        [CFG.front_length, CFG.car_width / 2],
        [CFG.front_length, -CFG.car_width / 2],
        [CFG.rear_length, CFG.car_width / 2],
        [CFG.rear_length, -CFG.car_width / 2],
    ])
    centers = np.asarray(car.centers)
    radii = np.asarray(car.radii)
    for cx, cy in corners:
        d = np.hypot(centers[:, 0] - cx, centers[:, 1] - cy)
        assert (d <= radii + 1e-6).any()
    # Bounding circle contains all covering circles.
    bc = np.asarray(car.bounding_center)
    d = np.hypot(centers[:, 0] - bc[0], centers[:, 1] - bc[1]) + radii
    assert (d <= float(car.bounding_radius) + 0.4).all()


def test_collision_check_far_and_near():
    gm = _open_map_with_block()
    car = collision.make_car_geometry(CFG)
    # Far from the block: free.
    assert bool(collision.is_state_collision_free_improved(
        gm, car, -10.0, 0.0, 0.0))
    # Centered on the block: collision.
    assert not bool(collision.is_state_collision_free_improved(
        gm, car, 6.5, 0.0, 0.0))
    # Just ahead of the block pointing at it: front axle overlaps -> collision.
    assert not bool(collision.is_state_collision_free(
        gm, car, 2.0, 0.0, 0.0))
    # Outside the map: collision by convention.
    assert not bool(collision.is_state_collision_free_improved(
        gm, car, 100.0, 0.0, 0.0))


def test_batched_shapes():
    gm = _open_map_with_block()
    car = collision.make_car_geometry(CFG)
    xs = jnp.asarray(np.linspace(-15, 15, 12).reshape(3, 4))
    ys = jnp.zeros((3, 4))
    hs = jnp.zeros((3, 4))
    out = collision.is_state_collision_free_improved(gm, car, xs, ys, hs)
    assert out.shape == (3, 4)
