"""Reference path container: sampled states + collision corridor.

TPU-native equivalent of the ReferencePath/ReferencePathImpl pair (reference:
src/data_struct/reference_path_impl.cpp). Holds the smoothed splines x(s), y(s),
the resampled per-knot states, and the per-knot lateral corridor. Fixed-shape:
all arrays are padded to a static N with an ``n_valid`` count; the blocked
truncation (reference :220-229) shortens ``n_valid`` instead of resizing.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from tpu_pathopt import splines
from tpu_pathopt.config import PlannerConfig


@flax.struct.dataclass
class RefStates:
    """Sampled reference states (struct-of-arrays State, data_struct.hpp:14-26)."""

    x: jax.Array         # (N,)
    y: jax.Array
    heading: jax.Array
    k: jax.Array
    s: jax.Array
    n_valid: jax.Array   # () int32

    @property
    def mask(self):
        return jnp.arange(self.x.shape[0]) < self.n_valid


@flax.struct.dataclass
class CorridorBounds:
    """Per-knot lateral corridor at front axle / rear axle / center
    (VehicleStateBound, data_struct.hpp:74-93). lb = right bound (negative
    side), ub = left bound."""

    front_lb: jax.Array  # (N,)
    front_ub: jax.Array
    rear_lb: jax.Array
    rear_ub: jax.Array
    center_lb: jax.Array
    center_ub: jax.Array
    blocked: jax.Array   # () bool — a zero-width bound truncated the horizon
    n_valid: jax.Array   # () int32 — knots before the blockage


def build_reference_from_spline(xs: splines.CubicSpline, ys: splines.CubicSpline,
                                max_s, n_knots: int,
                                config: PlannerConfig) -> RefStates:
    """Sample the smoothed spline at fixed ``output_spacing``
    (reference: buildReferenceFromSpline, reference_path_impl.cpp:314-338).

    The reference optionally halves the spacing in high-curvature sections
    ("dynamic segmentation"); that produces data-dependent knot counts, so the
    batched engine uses fixed spacing (config.enable_dynamic_segmentation is
    documented as unsupported on the batched path).
    """
    ds = config.output_spacing
    i = jnp.arange(n_knots, dtype=jnp.float32)
    s = i * ds
    n_valid = jnp.minimum(
        (jnp.floor(max_s / ds).astype(jnp.int32) + 1),
        jnp.asarray(n_knots, jnp.int32))
    s = jnp.minimum(s, max_s)
    x = splines.evaluate(xs, s)
    y = splines.evaluate(ys, s)
    h = splines.heading(xs, ys, s)
    k = splines.curvature(xs, ys, s)
    return RefStates(x=x, y=y, heading=h, k=k, s=s, n_valid=n_valid)
