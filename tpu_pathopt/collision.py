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


# ---------------------------------------------------------------------------
# Box / BoxByCircles (reference: include/data_struct/data_struct.hpp:34-72).
# The reference DECLARES these classes but their method bodies are absent
# from the repository (Box::Box / Box::distanceTo / BoxByCircles::BoxByCircles
# are never defined; calling them would fail to link). The API surface is
# reproduced here with working semantics: distanceTo is the Euclidean
# distance from a point to the oriented box (0 inside), and the circle
# decomposition follows the covering scheme CarGeometry uses for the vehicle
# footprint (car_geometry.cpp:38-57) generalized to an arbitrary box.
# ---------------------------------------------------------------------------

BOX_DIR_UNKNOWN, BOX_DIR_LEFT, BOX_DIR_RIGHT = 0, 1, 2


@flax.struct.dataclass
class Box:
    """Oriented box: center pose + size + passing-side tag
    (data_struct.hpp:34-53; Dir LEFT/RIGHT/UNKNOWN)."""

    x: jax.Array
    y: jax.Array
    heading: jax.Array
    length: jax.Array
    width: jax.Array
    dir: jax.Array          # () int32 — BOX_DIR_*


def make_box(x, y, heading, length, width, is_left=None) -> Box:
    """The two reference constructors (data_struct.hpp:38-39): without
    ``is_left`` the passing side is UNKNOWN."""
    d = BOX_DIR_UNKNOWN if is_left is None else (
        BOX_DIR_LEFT if is_left else BOX_DIR_RIGHT)
    f = lambda v: jnp.asarray(v, jnp.float32)
    return Box(x=f(x), y=f(y), heading=f(heading), length=f(length),
               width=f(width), dir=jnp.asarray(d, jnp.int32))


def box_distance_to(box: Box, px, py):
    """Euclidean distance from point(s) to the box (0 inside) — the declared
    ``Box::distanceTo`` (data_struct.hpp:46). Vectorized over any leading
    shape of (px, py)."""
    from tpu_pathopt.geometry import global_to_local
    lx, ly, _ = global_to_local(box.x, box.y, box.heading,
                                jnp.asarray(px), jnp.asarray(py))
    dx = jnp.maximum(jnp.abs(lx) - 0.5 * box.length, 0.0)
    dy = jnp.maximum(jnp.abs(ly) - 0.5 * box.width, 0.0)
    return jnp.hypot(dx, dy)


def box_by_circles(box: Box, n_circles: int = 6):
    """Cover the box with ``n_circles`` equal circles along its major axis
    (the declared ``BoxByCircles`` container, data_struct.hpp:63-72).
    Returns (centers (C, 2) global, radii (C,)); every point of the box is
    inside at least one circle (radius = half diagonal of a length/C x width
    slice). Static circle count — fixed shapes for batching."""
    step = box.length / n_circles
    offs = (jnp.arange(n_circles, dtype=jnp.float32) + 0.5) * step \
        - 0.5 * box.length
    r = 0.5 * jnp.hypot(step, box.width)
    gx, gy, _ = local_to_global(box.x, box.y, box.heading,
                                offs, jnp.zeros_like(offs))
    centers = jnp.stack([gx, gy], axis=-1)
    return centers, jnp.broadcast_to(r, (n_circles,))
