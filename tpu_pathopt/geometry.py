"""SE(2) geometry helpers, batched.

TPU-native equivalents of the reference's scalar helpers in src/tools/tools.cpp:
``constrainAngle`` (tools.hpp:24), ``local2Global``/``global2Local``
(tools.cpp:50-64), ``distance`` (tools.cpp:46). Everything here is elementwise
jnp, so it vmaps/shards trivially over scenario and knot axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def constrain_angle(angle):
    """Wrap angle to (-pi, pi]. Vectorized (reference: tools.hpp:24-30 does this
    recursively; here it is a single fmod)."""
    return jnp.mod(angle + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def distance(x1, y1, x2, y2):
    return jnp.hypot(x2 - x1, y2 - y1)


def local_to_global(ref_x, ref_y, ref_heading, x, y, heading=0.0):
    """SE(2) transform of a point/pose from the frame at (ref_x, ref_y, ref_heading)
    to the global frame (reference: tools.cpp:50-55)."""
    c, s = jnp.cos(ref_heading), jnp.sin(ref_heading)
    gx = x * c - y * s + ref_x
    gy = x * s + y * c + ref_y
    return gx, gy, ref_heading + heading


def global_to_local(ref_x, ref_y, ref_heading, x, y, heading=0.0):
    """Inverse of :func:`local_to_global` (reference: tools.cpp:57-64)."""
    dx, dy = x - ref_x, y - ref_y
    c, s = jnp.cos(ref_heading), jnp.sin(ref_heading)
    lx = dx * c + dy * s
    ly = -dx * s + dy * c
    return lx, ly, heading - ref_heading


def normal_offset(x, y, heading, l):
    """Point displaced laterally by l along the left normal of `heading`
    (the reference's recurring `x + l*cos(heading+pi/2)` pattern)."""
    return x - l * jnp.sin(heading), y + l * jnp.cos(heading)
