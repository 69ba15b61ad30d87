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
from tpu_pathopt.jaxutil import with_vma_of


@flax.struct.dataclass
class RefStates:
    """Sampled reference states (struct-of-arrays State, data_struct.hpp:14-26)."""

    x: jax.Array         # (N,)
    y: jax.Array
    heading: jax.Array
    k: jax.Array
    s: jax.Array
    n_valid: jax.Array   # () int32
    # True when the static N knots did not reach max_s: the end-state rows
    # (end l in [-1, 1], heading pin) then bind at a knot short of the target.
    # The reference's growing knot vector cannot truncate; the fixed-shape
    # build can, so it is surfaced instead of silently clamping.
    truncated: jax.Array  # () bool

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
    # Axle-center geometry the bounds are anchored to (VehicleStateBound
    # carries x/y/heading per bound, data_struct.hpp:74-93; the demo renders
    # the bound endpoints as spheres there, demo.cpp:331-375). Optional —
    # None when a caller assembles bounds without geometry (e.g. oracles).
    front_x: jax.Array | None = None   # (N,)
    front_y: jax.Array | None = None
    rear_x: jax.Array | None = None
    rear_y: jax.Array | None = None
    heading: jax.Array | None = None   # (N,) state heading at each knot


def build_reference_from_spline(xs: splines.CubicSpline, ys: splines.CubicSpline,
                                max_s, n_knots: int,
                                config: PlannerConfig) -> RefStates:
    """Sample the smoothed spline at ``output_spacing``
    (reference: buildReferenceFromSpline, reference_path_impl.cpp:314-338).

    With ``config.enable_dynamic_segmentation`` the spacing shrinks toward
    ``output_spacing / 2`` where |k| ramps through [0.08, 0.2] (:321-335, the
    reference's delta_s_smaller=0.15 at path_optimizer.cpp:119). The
    reference's while-loop produces a data-dependent knot count; here the same
    recurrence runs as a fixed-length ``lax.scan`` over the static N knots
    with the tail clamped to ``max_s`` and masked via ``n_valid``, so shapes
    stay static. On by default (the reference default); the scan is unrolled
    so the sequential per-knot spline evals amortize the loop overhead.
    """
    ds = config.output_spacing
    max_s = jnp.asarray(max_s, jnp.float32)
    if config.enable_dynamic_segmentation:
        ds_small = ds / 2.0
        large_k, small_k = 0.2, 0.08

        def step(s_cur, _):
            k_i = splines.curvature(xs, ys, s_cur)
            share = jnp.clip((jnp.abs(k_i) - small_k) / (large_k - small_k),
                             0.0, 1.0)
            return s_cur + ds - share * (ds - ds_small), s_cur

        # Carry init derives its varying-axes type from the spline data so
        # the scan traces under shard_map(check_vma=True) (jaxutil.with_vma_of).
        s0 = with_vma_of(jnp.asarray(0.0, jnp.float32), (xs.y, ys.y))
        _, s = jax.lax.scan(step, s0, None, length=n_knots, unroll=8)
        n_valid = jnp.sum((s <= max_s).astype(jnp.int32))
        # All N knots under max_s => the horizon stopped short of the target
        # (worst case: every spacing halved, N knots cover N*ds/2 meters).
        truncated = s[-1] < max_s
    else:
        i = jnp.arange(n_knots, dtype=jnp.float32)
        s = i * ds
        n_valid = jnp.minimum(
            (jnp.floor(max_s / ds).astype(jnp.int32) + 1),
            jnp.asarray(n_knots, jnp.int32))
        truncated = (n_knots - 1) * ds < max_s
    s = jnp.minimum(s, max_s)
    x = splines.evaluate(xs, s)
    y = splines.evaluate(ys, s)
    h = splines.heading(xs, ys, s)
    k = splines.curvature(xs, ys, s)
    return RefStates(x=x, y=y, heading=h, k=k, s=s, n_valid=n_valid,
                     truncated=jnp.asarray(truncated))
