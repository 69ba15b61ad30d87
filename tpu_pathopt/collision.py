"""Vehicle footprint geometry + circle-decomposition collision checks.

TPU-native re-design of CarGeometry (reference: src/tools/car_geometry.cpp —
six covering circles + one bounding circle, :38-57) and CollisionChecker
(src/tools/collision_checker.cpp — coarse bounding-circle test then the exact
six-circle test, :17-59). In the reference the checker is constructed by
PathOptimizer but never invoked in the pipeline (collision is enforced through
QP corridor bounds); it is provided here as batched API surface for users who
want explicit state checks, e.g. for post-validation of optimized paths.
"""

from __future__ import annotations

import math

import flax.struct
import jax
import jax.numpy as jnp

from tpu_pathopt import maps
from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.geometry import local_to_global


@flax.struct.dataclass
class CarGeometry:
    """Covering circles in the vehicle frame: centers (C, 2), radii (C,),
    plus the bounding circle (center (2,), radius ())."""

    centers: jax.Array
    radii: jax.Array
    bounding_center: jax.Array
    bounding_radius: jax.Array


def make_car_geometry(config: PlannerConfig) -> CarGeometry:
    """Six covering circles (reference: setCircles, car_geometry.cpp:38-57):
    four small corner circles + two large mid circles + a bounding circle."""
    width = config.car_width
    front = config.front_length
    back = abs(config.rear_length)
    length = front + back

    bc_x = (front - back) / 2.0
    bc_r = math.sqrt((length / 2.0) ** 2 + (width / 2.0) ** 2)

    shift = width / 4.0
    small_r = math.sqrt(2.0) * shift
    large_r = math.sqrt(width ** 2 + ((length - width) / 2.0) ** 2) / 2.0

    centers = jnp.asarray([
        [-back + shift, -width / 2.0 + shift],    # rr
        [-back + shift, width / 2.0 - shift],     # rl
        [front - shift, -width / 2.0 + shift],    # fr
        [front - shift, width / 2.0 - shift],     # fl
        [bc_x + (length - width) / 4.0, 0.0],     # fm
        [bc_x - (length - width) / 4.0, 0.0],     # rm
    ], jnp.float32)
    radii = jnp.asarray([small_r] * 4 + [large_r] * 2, jnp.float32)
    return CarGeometry(
        centers=centers, radii=radii,
        bounding_center=jnp.asarray([bc_x, 0.0], jnp.float32),
        bounding_radius=jnp.asarray(bc_r, jnp.float32))


def circles_global(car: CarGeometry, x, y, heading):
    """Covering-circle centers in the global frame for state(s) with any
    leading batch shape. Returns (gx, gy) each shaped (..., C)."""
    cx = car.centers[:, 0]
    cy = car.centers[:, 1]
    gx, gy, _ = local_to_global(
        jnp.asarray(x)[..., None], jnp.asarray(y)[..., None],
        jnp.asarray(heading)[..., None], cx, cy)
    return gx, gy


def is_state_collision_free(gm: maps.GridMap, car: CarGeometry, x, y, heading):
    """Exact six-circle check (isSingleStateCollisionFree,
    collision_checker.cpp:17-40). Outside the map counts as collision."""
    gx, gy = circles_global(car, x, y, heading)
    inside = maps.is_inside(gm, gx, gy)
    clear = maps.obstacle_distance(gm, gx, gy)
    ok = inside & (clear >= car.radii)
    return jnp.all(ok, axis=-1)


def is_state_collision_free_improved(gm: maps.GridMap, car: CarGeometry,
                                     x, y, heading):
    """Coarse bounding-circle test, falling back to the exact test only when
    the bound is violated (isSingleStateCollisionFreeImproved, :42-59).
    Branchless: the exact check is evaluated where needed via where()."""
    bx, by, _ = local_to_global(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(heading),
        car.bounding_center[0], car.bounding_center[1])
    inside = maps.is_inside(gm, bx, by)
    clear = maps.obstacle_distance(gm, bx, by)
    coarse_free = inside & (clear >= car.bounding_radius)
    exact = is_state_collision_free(gm, car, x, y, heading)
    return jnp.where(coarse_free, True, exact) & inside


def path_collision_free(gm: maps.GridMap, car: CarGeometry, result):
    """Batched post-validation of an optimized path (PathResult): fraction of
    valid knots that are collision free."""
    free = is_state_collision_free_improved(gm, car, result.x, result.y,
                                            result.heading)
    mask = result.mask
    n = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    return jnp.sum((free & mask).astype(jnp.int32)) / n
