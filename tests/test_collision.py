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


def test_box_distance_inside_outside_rotated():
    """Box/distanceTo semantics (declared at data_struct.hpp:34-53 but never
    implemented in the reference; working semantics provided here)."""
    from tpu_pathopt.collision import box_distance_to, make_box
    box = make_box(2.0, 1.0, np.pi / 2, 4.0, 2.0)   # long axis along +y
    # Center and a point well inside.
    assert float(box_distance_to(box, 2.0, 1.0)) == 0.0
    assert float(box_distance_to(box, 2.5, 2.5)) == 0.0
    # 1 m beyond the +length face (which points along +y).
    np.testing.assert_allclose(float(box_distance_to(box, 2.0, 4.0)), 1.0,
                               atol=1e-6)
    # 0.5 m beyond the width face (along +x).
    np.testing.assert_allclose(float(box_distance_to(box, 3.5, 1.0)), 0.5,
                               atol=1e-6)
    # Corner region: diagonal distance.
    np.testing.assert_allclose(float(box_distance_to(box, 3.5, 3.5)),
                               np.hypot(0.5, 0.5), atol=1e-6)


def test_box_by_circles_covers_box():
    from tpu_pathopt.collision import (box_by_circles, box_distance_to,
                                       make_box, BOX_DIR_LEFT)
    box = make_box(-1.0, 3.0, 0.7, 4.9, 2.0, is_left=True)
    assert int(box.dir) == BOX_DIR_LEFT
    centers, radii = box_by_circles(box)
    assert centers.shape == (6, 2) and radii.shape == (6,)
    # Every random point inside the box lies inside >= 1 circle.
    rng = np.random.default_rng(3)
    lx = rng.uniform(-2.45, 2.45, 500)
    ly = rng.uniform(-1.0, 1.0, 500)
    c, s = np.cos(0.7), np.sin(0.7)
    px = -1.0 + c * lx - s * ly
    py = 3.0 + s * lx + c * ly
    assert np.all(np.asarray(box_distance_to(box, jnp.asarray(px),
                                             jnp.asarray(py))) == 0.0)
    d = np.hypot(px[:, None] - np.asarray(centers)[None, :, 0],
                 py[:, None] - np.asarray(centers)[None, :, 1])
    assert np.all((d <= np.asarray(radii)[None, :] + 1e-5).any(axis=1))
