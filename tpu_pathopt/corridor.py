"""DP corridor search over the Frenet lattice.

TPU-native re-design of ``graphSearchDp`` (reference:
src/reference_path_smoother/reference_path_smoother.cpp:142-295): sample a
lattice of lateral offsets on longitudinal layers along the smoothed reference,
run a dynamic program with obstacle/deviation/angle-change costs
(calculateCostAt, :107-140), backtrack the cheapest node in the deepest
reachable layer, and widen each backtracked node's lateral corridor by
ESDF ray-marching (:250-287). The resulting per-layer (lower, upper) corridor
feeds the post-smoothing QP.

Everything is fixed-shape: L static layers x K static laterals, a reverse
scan for backtracking, and masked fixed-iteration marches for the corridor
expansion. The layer-sequential DP forward pass (sequential because the
angle-change cost needs the parent's incoming edge direction) is split out
behind :func:`dp_forward_batched`: one fused Pallas kernel over the whole
scenario batch on TPU (grid step = layer, frontier in VMEM scratch,
precomputed edge blocks streaming in), a ``lax.scan`` elsewhere — both
bit-identical. All state-independent edge costs (directions, ref-angle
term, |dl| <= ds gate, node feasibility/self costs) are precomputed
vectorized over every (L-1, K_prev, K) at once in :func:`prepare_lattice`.

``search_corridor_astar`` rebuilds the reference's A* variant (graphSearch,
:297-484, with getG :91-105 and getH :645-651). The reference's heuristic
``h = 0.1 * (target_s - s)`` is constant within a layer and the lattice is a
layered DAG (edges only go layer i -> i+1), so a full per-layer relaxation
scan computes the exact min-g label for every node — the priority queue only
changes *expansion order*, never which parent wins a node under relaxation.
The reference's h is non-admissible (its own comment at :646) and can return
suboptimal paths; this rebuild always returns the true min-g path, a
documented, knowingly-fixed divergence (SURVEY.md §7 quirks policy).
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pathopt import maps, splines
from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.geometry import constrain_angle, global_to_local, normal_offset
from tpu_pathopt.jaxutil import with_vma_of

_INF = 1e30
_CHECK_S = 0.2
_CHECK_LIMIT = 6.0


def _hold_from_run_start(feas, vals, reverse):
    """``vals`` held from the start of the contiguous feasible run containing
    each lateral index (the reference's nearest-infeasible-neighbor scans,
    reference_path_smoother.cpp:210-226): for infeasible k the value is its
    own ``vals[k]``; for feasible k it is the value at the first index of
    k's feasible run. One ``cummax`` over run-start indices instead of a
    K-step ``lax.scan`` — the scan was ~70 sequential micro-ops per
    corridor, pure loop latency on TPU."""
    if reverse:
        feas = feas[:, ::-1]
        vals = vals[:, ::-1]
    K = feas.shape[-1]
    prev = jnp.concatenate(
        [jnp.zeros_like(feas[:, :1]), feas[:, :-1]], axis=-1)
    new_run = ~(feas & prev)                  # run boundary (or infeasible)
    idx = jnp.broadcast_to(jnp.arange(K), feas.shape)
    start = jax.lax.cummax(jnp.where(new_run, idx, -1), axis=feas.ndim - 1)
    out = jnp.take_along_axis(vals, start, axis=-1)
    return out[:, ::-1] if reverse else out
# Worst-case march span: a rough bound hugging one wall at -10 m marching to
# the +6 m check limit = (6 - (-10)) / 0.2 = 80 steps; +2 margin for the
# initial offset step and the final step-back.
_EXPAND_STEPS = 82


@flax.struct.dataclass
class Corridor:
    layers_s: jax.Array    # (L,)
    lower: jax.Array       # (L,)
    upper: jax.Array       # (L,)
    n_layers: jax.Array    # () int32 — valid layers (deepest reached + 1)
    vehicle_l: jax.Array   # () lateral offset of the vehicle wrt smoothed ref
    ok: jax.Array          # () bool


@flax.struct.dataclass
class DpLattice:
    """Everything the DP forward pass and the corridor finish need, computed
    per scenario by :func:`prepare_lattice` (the lattice construction half of
    graphSearchDp, reference_path_smoother.cpp:148-226)."""

    layers_s: jax.Array    # (L,)
    n_layers: jax.Array    # () int32
    vehicle_l: jax.Array   # ()
    ok: jax.Array          # () bool
    ref_x: jax.Array       # (L,)
    ref_y: jax.Array
    ref_h: jax.Array
    rough_lb: jax.Array    # (L, K)
    rough_ub: jax.Array
    dir_all: jax.Array     # (L-1, Kp, K) edge directions between layers
    base_all: jax.Array    # (L-1, Kp, K) state-independent edge+node costs
    cost0: jax.Array       # (K,) layer-0 costs (0 at the start node)
    dir0: jax.Array        # (K,) layer-0 incoming direction (start heading)


@flax.struct.dataclass
class _LatticeGeom:
    """Lattice geometry shared verbatim by the DP and A* variants
    (reference :148-199 vs :304-347 — the construction differs only in the
    feasibility rule, which stays in each caller)."""

    layers_s: jax.Array    # (L,)
    n_layers: jax.Array    # () int32
    vehicle_l: jax.Array   # ()
    ok: jax.Array          # () bool
    lat: jax.Array         # (K,) lateral offsets
    ref_x: jax.Array       # (L,)
    ref_y: jax.Array
    ref_h: jax.Array
    ref_k: jax.Array       # (L,) reference curvature at the layers
    ref_r: jax.Array       # (L,) signed turn radius 1/k (epsilon-clamped)
    node_x: jax.Array      # (L, K) lattice node positions
    node_y: jax.Array
    dis: jax.Array         # (L, K) node clearance (-1 outside the map)


def _build_lattice_geom(gm: maps.GridMap, xs: splines.CubicSpline,
                        ys: splines.CubicSpline, length, start_x, start_y,
                        config: PlannerConfig) -> _LatticeGeom:
    """Layers, vehicle projection and node sampling (reference :148-199;
    the A* variant repeats the same construction at :304-347)."""
    cfg = config
    L = cfg.dp_layers
    K = cfg.dp_laterals
    lat_range = cfg.search_lateral_range
    dt = jnp.float32

    # --- Layer longitudinal positions (:148-158) ---
    proj_s = splines.project(xs, ys, start_x, start_y, length,
                             iters=cfg.newton_iters)
    search_ds = jnp.where(length > 6.0, cfg.search_longitudinal_spacing, 0.5)
    j = jnp.arange(L, dtype=dt)
    n_interior = jnp.ceil((length - proj_s) / search_ds -
                          1e-6).astype(jnp.int32)
    n_layers = jnp.clip(n_interior + 1, 1, L)
    layers_s = jnp.where(j < (n_layers - 1).astype(dt),
                         proj_s + j * search_ds, length)

    # --- Vehicle lateral offset wrt the smoothed reference (:160-169) ---
    px = splines.evaluate(xs, proj_s)
    py = splines.evaluate(ys, proj_s)
    ph = splines.heading(xs, ys, proj_s)
    _, vehicle_l, _ = global_to_local(px, py, ph, start_x, start_y)
    ok = jnp.abs(vehicle_l) <= lat_range

    # --- Lattice nodes (:171-199) ---
    lat = -lat_range + cfg.search_lateral_spacing * jnp.arange(K, dtype=dt)
    ref_x = splines.evaluate(xs, layers_s)                    # (L,)
    ref_y = splines.evaluate(ys, layers_s)
    ref_h = splines.heading(xs, ys, layers_s)
    ref_k = splines.curvature(xs, ys, layers_s)
    node_x, node_y = normal_offset(ref_x[:, None], ref_y[:, None],
                                   ref_h[:, None], lat[None, :])   # (L, K)
    inside = maps.is_inside(gm, node_x, node_y)
    dis = jnp.where(inside, maps.obstacle_distance(gm, node_x, node_y), -1.0)
    # Signed turn radius 1/k (reference :182 divides raw). The epsilon clamp
    # must preserve the sign: substituting +1e-9 for a tiny *negative* k flips
    # ref_r to +1e9 while the (ref_k < 0) branch still fires, marking every
    # node infeasible (caught by the float64 gridmap parity oracle).
    ref_r = 1.0 / jnp.where(jnp.abs(ref_k) < 1e-9,
                            jnp.where(ref_k < 0, -1e-9, 1e-9), ref_k)
    return _LatticeGeom(layers_s=layers_s, n_layers=n_layers,
                        vehicle_l=vehicle_l.astype(dt), ok=ok, lat=lat,
                        ref_x=ref_x, ref_y=ref_y, ref_h=ref_h,
                        ref_k=ref_k, ref_r=ref_r,
                        node_x=node_x, node_y=node_y, dis=dis)


def _rough_bounds(feasible, lat, L, K):
    """Per-layer rough (lb, ub) from lateral feasibility contiguity
    (reference :210-226 / :349-361)."""
    lat_grid = jnp.broadcast_to(lat, (L, K))
    return (_hold_from_run_start(feasible, lat_grid, reverse=False),
            _hold_from_run_start(feasible, lat_grid, reverse=True))


def prepare_lattice(gm: maps.GridMap, xs: splines.CubicSpline,
                    ys: splines.CubicSpline, length, start_x, start_y,
                    start_heading, config: PlannerConfig) -> DpLattice:
    cfg = config
    L = cfg.dp_layers
    K = cfg.dp_laterals
    lat_range = cfg.search_lateral_range
    dt = jnp.float32

    g = _build_lattice_geom(gm, xs, ys, length, start_x, start_y, cfg)
    layers_s, n_layers = g.layers_s, g.n_layers
    lat, dis = g.lat, g.dis
    ref_x, ref_y, ref_h = g.ref_x, g.ref_y, g.ref_h
    start_idx = ((lat_range + g.vehicle_l)
                 / cfg.search_lateral_spacing).astype(jnp.int32)
    start_idx = jnp.clip(start_idx, 0, K - 1)

    # --- DP feasibility rule (:176-205): clearance threshold + the turn
    # radius marking nodes infeasible ---
    threshold = cfg.car_width / 2.0 + 0.2
    radius_bad = \
        ((g.ref_k[:, None] < 0) & (lat[None, :] < g.ref_r[:, None])) | \
        ((g.ref_k[:, None] > 0) & (lat[None, :] > g.ref_r[:, None]))
    # The reference samples offsets in [-range, range] only (:176-179); the
    # static K-wide grid can overshoot by one spacing step, so mask it.
    feasible = ~(radius_bad | (dis < threshold)) & (lat[None, :] <= lat_range)
    # Layer 0: only the start node, forced feasible (:200-205).
    k_idx = jnp.arange(K)
    feasible = feasible.at[0].set(k_idx == start_idx)

    # --- Rough per-layer bounds over the lateral axis (:210-226) ---
    rough_lb, rough_ub = _rough_bounds(feasible, lat, L, K)

    # --- State-independent DP edge costs (:228-238 + calculateCostAt
    # :107-140), vectorized over all (L-1, K_prev, K) at once: directions,
    # the ref-angle term, the |dl| <= ds gate and node feasibility/self
    # costs depend only on the lattice, not on the DP state. ---
    safe_dist = cfg.dp_safe_distance
    self_cost = jnp.where(dis < safe_dist,
                          (safe_dist - dis) / safe_dist * cfg.dp_weight_obstacle,
                          0.0)
    self_cost = self_cost + jnp.abs(lat)[None, :] / lat_range \
        * cfg.dp_weight_ref_offset

    in_mask = jnp.arange(1, L) < n_layers
    feas_in = feasible[1:] & in_mask[:, None]
    dir_all = jnp.arctan2(g.node_y[1:, None, :] - g.node_y[:-1, :, None],
                          g.node_x[1:, None, :] - g.node_x[:-1, :, None])
    term2 = jnp.abs(constrain_angle(dir_all - ref_h[1:, None, None])) \
        / (jnp.pi / 2) * cfg.dp_weight_ref_angle_diff
    lat_ok = (jnp.abs(lat[None, None, :] - lat[None, :, None])
              <= (layers_s[1:] - layers_s[:-1])[:, None, None])
    base_all = jnp.where(lat_ok & feas_in[:, None, :],
                         term2 + self_cost[1:, None, :], _INF)

    cost0 = jnp.where(k_idx == start_idx, 0.0, _INF)
    dir0 = jnp.full((K,), start_heading, dt)
    return DpLattice(layers_s=layers_s, n_layers=n_layers,
                     vehicle_l=g.vehicle_l, ok=g.ok,
                     ref_x=ref_x, ref_y=ref_y, ref_h=ref_h,
                     rough_lb=rough_lb, rough_ub=rough_ub,
                     dir_all=dir_all, base_all=base_all,
                     cost0=cost0, dir0=dir0)


def _dp_forward_scan(dir_all, base_all, h_in, cost0, dir0, w1):
    """Per-scenario DP forward pass as a lax.scan over layers (CPU path and
    the per-scenario :func:`search_corridor` API). Returns
    (costs (L-1, K), parents (L-1, K) int32, alives (L-1,) bool)."""

    def dp_step(carry, inp):
        cost_p, dir_p, alive = carry
        direction, base, h_l = inp            # (Kp, K), (Kp, K), ()
        t1 = jnp.abs(constrain_angle(direction - dir_p[:, None])) \
            / (jnp.pi / 2) * w1
        total = cost_p[:, None] + t1 + base
        # Min + first-argmin + one-hot select instead of take_along_axis:
        # inside the sequential layer scan those small gathers dominate on
        # TPU (same effect as splines._select_rows).
        best_cost = jnp.min(total, axis=0)                     # (K,)
        kp_iota = jnp.arange(total.shape[0])[:, None]
        best_prev = jnp.min(jnp.where(total == best_cost[None, :], kp_iota,
                                      total.shape[0]), axis=0)
        onehot = kp_iota == best_prev[None, :]
        best_dir = jnp.sum(jnp.where(onehot, direction, 0.0), axis=0)
        layer_alive = alive & jnp.any(best_cost < _INF)
        cost_n = jnp.where(layer_alive, best_cost, _INF)
        dir_n = jnp.where(best_cost < _INF, best_dir, h_l)
        # Keep the previous frontier if this layer is dead (so deeper layers
        # stay dead too — costs all _INF).
        return ((cost_n, dir_n, layer_alive),
                (cost_n, best_prev, layer_alive))

    init = (cost0, dir0, with_vma_of(jnp.asarray(True), cost0))
    _, (costs, parents, alives) = jax.lax.scan(
        dp_step, init, (dir_all, base_all, h_in))
    return costs, parents, alives


def _dp_fwd_kernel(dir_ref, base_ref, h_ref, cost0_ref, dir0_ref,
                   costs_ref, parents_ref, alives_ref,
                   cost_s, dir_s, alive_s, *, w1: float):
    """One grid step = one DP layer for a full 128-lane scenario chunk.

    The 31-layer scan is inherently sequential (the angle-change cost needs
    the parent's incoming edge direction), and as 31 XLA scan steps it pays
    fixed per-step overhead that dwarfs the tiny (K, K, B) compute. Here the
    whole forward pass is ONE pallas_call: the frontier (cost/dir/alive)
    lives in VMEM scratch across grid steps while each layer's precomputed
    edge blocks stream in. Arithmetic is identical to _dp_forward_scan
    (wrap formula = geometry.constrain_angle)."""
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _():
        cost_s[:] = cost0_ref[0]
        dir_s[:] = dir0_ref[0]
        alive_s[:] = jnp.ones_like(alive_s)

    d = dir_ref[0]                        # (Kp, K, B)
    base = base_ref[0]
    cost_p = cost_s[:]                    # (K, B)
    dir_p = dir_s[:]
    diff = d - dir_p[:, None, :]
    wrapped = jnp.mod(diff + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    t1 = jnp.abs(wrapped) / (jnp.pi / 2.0) * w1
    total = cost_p[:, None, :] + t1 + base
    best_cost = jnp.min(total, axis=0)                        # (K, B)
    kp = jax.lax.broadcasted_iota(jnp.int32, total.shape, 0)
    best_prev = jnp.min(jnp.where(total == best_cost[None], kp,
                                  total.shape[0]), axis=0)
    onehot = kp == best_prev[None]
    best_dir = jnp.sum(jnp.where(onehot, d, 0.0), axis=0)
    alive = alive_s[:] > 0.0                                  # (1, B)
    col_alive = jnp.min(best_cost, axis=0, keepdims=True) < _INF
    layer_alive = alive & col_alive
    cost_n = jnp.where(layer_alive, best_cost, _INF)
    dir_n = jnp.where(best_cost < _INF, best_dir, h_ref[0])
    cost_s[:] = cost_n
    dir_s[:] = dir_n
    alive_s[:] = layer_alive.astype(cost_n.dtype)
    costs_ref[0] = cost_n
    parents_ref[0] = best_prev
    alives_ref[0] = layer_alive.astype(jnp.int32)


def _lane_sds(shape, dtype, like):
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _dp_forward_pallas(dir_all, base_all, h_in, cost0, dir0, w1,
                       interpret: bool = False):
    """Batched DP forward via the fused kernel: inputs batch-leading
    (B, L-1, Kp, K) / (B, L-1) / (B, K); batch rides the lanes in 128-wide
    chunks (edge-replicated padding, sliced off; interpret mode pads only
    to the real batch — CPU tests would otherwise do 128x the work)."""
    B, lm1, Kp, K = dir_all.shape
    lane = lambda a: jnp.moveaxis(a, 0, -1)
    d_l = lane(dir_all)                   # (Lm1, Kp, K, B)
    b_l = lane(base_all)
    h_l = lane(h_in)[:, None, :]          # (Lm1, 1, B)
    c0_l = lane(cost0)[None]              # (1, K, B)
    d0_l = lane(dir0)[None]

    ch = B if (interpret and B <= 128) else 128
    Bp = -(-B // ch) * ch

    def pad(a):
        if a.shape[-1] == Bp:
            return a
        reps = jnp.broadcast_to(a[..., -1:], a.shape[:-1] + (Bp - a.shape[-1],))
        return jnp.concatenate([a, reps], axis=-1)

    d_l, b_l, h_l, c0_l, d0_l = map(pad, (d_l, b_l, h_l, c0_l, d0_l))

    def run_chunk(dc, bc, hc, cc, dcc):
        return pl.pallas_call(
            functools.partial(_dp_fwd_kernel, w1=w1),
            grid=(lm1,),
            in_specs=[
                pl.BlockSpec((1, Kp, K, ch), lambda l: (l, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Kp, K, ch), lambda l: (l, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ch), lambda l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, ch), lambda l: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, ch), lambda l: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, K, ch), lambda l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, ch), lambda l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ch), lambda l: (l, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                _lane_sds((lm1, K, ch), jnp.float32, dc),
                _lane_sds((lm1, K, ch), jnp.int32, dc),
                _lane_sds((lm1, 1, ch), jnp.int32, dc),
            ),
            scratch_shapes=[
                pltpu.VMEM((K, ch), jnp.float32),
                pltpu.VMEM((K, ch), jnp.float32),
                pltpu.VMEM((1, ch), jnp.float32),
            ],
            interpret=interpret,
        )(dc, bc, hc, cc, dcc)

    outs = []
    for c in range(Bp // ch):
        sl = slice(c * ch, (c + 1) * ch)
        outs.append(run_chunk(d_l[..., sl], b_l[..., sl], h_l[..., sl],
                              c0_l[..., sl], d0_l[..., sl]))
    costs = jnp.concatenate([o[0] for o in outs], axis=-1)[..., :B]
    parents = jnp.concatenate([o[1] for o in outs], axis=-1)[..., :B]
    alives = jnp.concatenate([o[2] for o in outs], axis=-1)[..., :B]
    unlane = lambda a: jnp.moveaxis(a, -1, 0)
    return (unlane(costs), unlane(parents),
            unlane(alives)[:, :, 0] > 0)


def dp_forward_batched(lat: DpLattice, config: PlannerConfig):
    """DP forward over a batched DpLattice (every leaf batch-leading):
    the fused Pallas kernel on TPU backends, vmapped scan elsewhere."""
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        return _dp_forward_pallas(lat.dir_all, lat.base_all, lat.ref_h[:, 1:],
                                  lat.cost0, lat.dir0,
                                  config.dp_weight_angle_change)
    return jax.vmap(
        lambda d, b, h, c0, d0: _dp_forward_scan(
            d, b, h, c0, d0, config.dp_weight_angle_change))(
        lat.dir_all, lat.base_all, lat.ref_h[:, 1:], lat.cost0, lat.dir0)


def _backtrack(parents, max_layer, best_k_last, L, K):
    """Reverse scan from the best node in the deepest reached layer
    (reference :240-287 / :430-447). One-hot parent selects instead of
    dynamic gathers (see _dp_forward_scan)."""

    def back_step(k_next, inp):
        layer_idx, parent_row = inp
        on_path = layer_idx <= max_layer
        k = jnp.where(layer_idx == max_layer, best_k_last, k_next)
        k_prev = jnp.sum(jnp.where(jnp.arange(K) == k, parent_row, 0))
        return jnp.where(on_path, k_prev, k_next), k

    _, path_k = jax.lax.scan(back_step, best_k_last,
                             (jnp.arange(L), parents), reverse=True)
    return path_k


def _expand_corridor(gm, ref_x, ref_y, ref_h, rough_lb, rough_ub, path_k,
                     max_layer, thr_up, thr_lo):
    """Corridor expansion around the backtracked nodes (reference :250-287;
    the A* variant repeats it with asymmetric thresholds at :449-484):
    march from each node's rough bound in 0.2 m steps while |pos| < 6 m and
    the ESDF clearance at the lattice point stays above the threshold; on
    the first failure step back once (reference loop semantics :260-283).
    Layer 0 gets the full +-10 m range (:251-252); layers beyond the
    backtracked path are masked to 0. Returns (lower, upper)."""
    dt = jnp.float32
    L = ref_x.shape[0]
    node_lb = jnp.take_along_axis(rough_lb, path_k[:, None], 1)[:, 0]
    node_ub = jnp.take_along_axis(rough_ub, path_k[:, None], 1)[:, 0]

    # Both sides ride ONE stacked probe call (leading axis = upper, lower):
    # measured TPU gather throughput rises with indices per call, so two
    # half-size marches cost ~1.5x one stacked march (same stacking as the
    # bounds clearance marches, PERF.md). Values are identical to the
    # per-side marches.
    t = jnp.arange(_EXPAND_STEPS, dtype=dt)
    base2 = jnp.stack([node_ub + _CHECK_S, node_lb - _CHECK_S])    # (2, L)
    sign2 = jnp.asarray([1.0, -1.0], dt)[:, None, None]
    thr2 = jnp.asarray([thr_up, thr_lo], dt)[:, None, None]
    cand = base2[:, :, None] + sign2 * _CHECK_S * t[None, None, :]  # (2,L,T)
    within = (sign2 * cand) < _CHECK_LIMIT
    cx, cy = normal_offset(ref_x[None, :, None], ref_y[None, :, None],
                           ref_h[None, :, None], cand)
    good = maps.is_inside(gm, cx, cy) & \
        (maps.obstacle_distance(gm, cx, cy) > thr2)
    fail = within & ~good
    first_fail = jnp.argmax(
        jnp.concatenate([fail, jnp.ones((2, L, 1), bool)], -1)
        .astype(jnp.int32), axis=-1)
    n_within = jnp.sum(within.astype(jnp.int32), axis=-1)
    exited = first_fail >= n_within
    # Fail at step t* -> base + sign*0.2*(t*-1); no fail -> first step
    # beyond the 6 m limit (loop exits without stepping back).
    s2 = sign2[:, :, 0]
    result_fail = base2 + s2 * _CHECK_S * (first_fail.astype(dt) - 1.0)
    result_exit = base2 + s2 * _CHECK_S * n_within.astype(dt)
    res2 = jnp.where(exited, result_exit, result_fail)
    upper = res2[0].at[0].set(10.0)
    lower = res2[1].at[0].set(-10.0)
    valid = jnp.arange(L) <= max_layer
    return jnp.where(valid, lower, 0.0), jnp.where(valid, upper, 0.0)


def finish_corridor(gm: maps.GridMap, lat: DpLattice, costs, parents, alives,
                    config: PlannerConfig) -> Corridor:
    """Backtrack + corridor expansion (:240-287) from a DP forward pass."""
    cfg = config
    L = cfg.dp_layers
    K = cfg.dp_laterals
    threshold = cfg.car_width / 2.0 + 0.2

    costs = jnp.concatenate([lat.cost0[None], costs])          # (L, K)
    parents = jnp.concatenate([jnp.zeros((1, K), jnp.int32), parents])
    alives = jnp.concatenate([jnp.asarray([True]), alives])    # (L,)

    max_layer = jnp.max(jnp.where(alives & (jnp.arange(L) < lat.n_layers),
                                  jnp.arange(L), 0))
    best_k_last = jnp.argmin(costs[max_layer])
    path_k = _backtrack(parents, max_layer, best_k_last, L, K)
    # Node heading := ref heading per layer (:189); DP thresholds symmetric.
    lower, upper = _expand_corridor(
        gm, lat.ref_x, lat.ref_y, lat.ref_h, lat.rough_lb, lat.rough_ub,
        path_k, max_layer, threshold, threshold)

    return Corridor(layers_s=lat.layers_s, lower=lower, upper=upper,
                    n_layers=(max_layer + 1).astype(jnp.int32),
                    vehicle_l=lat.vehicle_l, ok=lat.ok)


def search_corridor(gm: maps.GridMap, xs: splines.CubicSpline,
                    ys: splines.CubicSpline, length, start_x, start_y,
                    start_heading, config: PlannerConfig) -> Corridor:
    """Per-scenario corridor search: prepare -> scan forward -> finish.
    The batched pipeline uses :func:`prepare_lattice` +
    :func:`dp_forward_batched` + :func:`finish_corridor` directly so the
    forward pass can run as one fused kernel over the whole batch."""
    lat = prepare_lattice(gm, xs, ys, length, start_x, start_y,
                          start_heading, config)
    costs, parents, alives = _dp_forward_scan(
        lat.dir_all, lat.base_all, lat.ref_h[1:], lat.cost0, lat.dir0,
        config.dp_weight_angle_change)
    return finish_corridor(gm, lat, costs, parents, alives, config)


def search_corridor_astar(gm: maps.GridMap, xs: splines.CubicSpline,
                          ys: splines.CubicSpline, length, start_x, start_y,
                          start_heading, config: PlannerConfig) -> Corridor:
    """A*-lattice corridor search (reference graphSearch,
    reference_path_smoother.cpp:297-484).

    Differences from the DP variant, mirrored from the reference:
    - node feasibility threshold ``1.2 * half_width`` (:345, search_k) and the
      turn-radius limit *clamps the sampling range* (:332-339) instead of
      marking nodes infeasible;
    - per-node cost is getG (:91-105): obstacle proximity under a 5 m safety
      distance plus lateral-deviation cost — no smoothness/edge term, so the
      edge only gates feasibility via the 60-degree direction limit (:421);
    - corridor expansion thresholds are asymmetric: ``1.3 * half_width`` on
      the upper side (:458), ``1.2 * half_width`` on the lower (:471).
    """
    cfg = config
    L = cfg.dp_layers
    K = cfg.dp_laterals
    lat_range = cfg.search_lateral_range
    dt = jnp.float32
    half_width = cfg.car_width * 0.5

    # Layers / vehicle projection / node sampling shared with the DP
    # variant (:304-347 repeats :148-199 in the reference).
    g = _build_lattice_geom(gm, xs, ys, length, start_x, start_y, cfg)
    layers_s, n_layers = g.layers_s, g.n_layers
    lat, dis = g.lat, g.dis
    ref_x, ref_y, ref_h = g.ref_x, g.ref_y, g.ref_h
    vehicle_l, ok = g.vehicle_l, g.ok

    # --- A* feasibility rule (:330-347): the turn radius CLAMPS the
    # sampling range (vs marking nodes infeasible in DP), and the clearance
    # threshold is 1.2 * half_width (search_k, :345) ---
    in_range = jnp.where(g.ref_r[:, None] > 0,
                         lat[None, :] <= jnp.minimum(lat_range,
                                                     g.ref_r[:, None]),
                         lat[None, :] >= jnp.maximum(-lat_range,
                                                     g.ref_r[:, None]))
    # The static K-wide grid overshoots +lat_range by up to one spacing step;
    # the reference samples offsets in [-range, range] only (:332-339), so cap
    # both signs of curvature (mirrors the DP variant's mask above).
    in_range = in_range & (lat[None, :] <= lat_range)
    feasible = in_range & (dis > 1.2 * half_width)

    # --- Rough per-layer bounds from lateral contiguity (:349-361) ---
    rough_lb, rough_ub = _rough_bounds(feasible, lat, L, K)

    # --- Per-node g increment = getG (:91-105): obstacle + deviation ---
    safety_distance = 5.0
    self_cost = jnp.where(
        dis < safety_distance,
        (safety_distance - dis) / safety_distance * cfg.search_obstacle_cost,
        0.0)
    self_cost = self_cost + jnp.abs(lat)[None, :] / lat_range \
        * cfg.search_deviation_cost

    # --- Layered relaxation (exact min-g; replaces the priority queue) ---
    # The 60-degree transition gate (:421) and node costs depend only on the
    # lattice, so the whole (L-1, K_prev, K) edge-cost tensor precomputes
    # outside the sequential scan (see the DP variant above). Layer 0 is the
    # single start node at l = vehicle_l: its degenerate "lattice" has every
    # column at the start offset.
    tan60 = jnp.tan(jnp.deg2rad(60.0))
    k_idx = jnp.arange(K)
    in_mask = jnp.arange(1, L) < n_layers
    feas_in = feasible[1:] & in_mask[:, None]
    l_prev_all = jnp.concatenate(
        [jnp.full((1, K), vehicle_l, dt),
         jnp.broadcast_to(lat, (L - 2, K))], axis=0)          # (L-1, Kp)
    edge_ok = (jnp.abs(lat[None, None, :] - l_prev_all[:, :, None])
               <= tan60 * (layers_s[1:] - layers_s[:-1])[:, None, None])
    base_all = jnp.where(edge_ok & feas_in[:, None, :],
                         self_cost[1:, None, :], _INF)

    def relax_step(carry, inp):
        g_p, alive = carry
        base = inp                                            # (Kp, K)
        total = g_p[:, None] + base
        # Min + first-argmin without the take_along_axis gather (see dp_step).
        best_g = jnp.min(total, axis=0)                       # (K,)
        kp_iota = jnp.arange(total.shape[0])[:, None]
        best_prev = jnp.min(jnp.where(total == best_g[None, :], kp_iota,
                                      total.shape[0]), axis=0)
        layer_alive = alive & jnp.any(best_g < _INF)
        g_n = jnp.where(layer_alive, best_g, _INF)
        return ((g_n, layer_alive), (g_n, best_prev, layer_alive))

    g0 = jnp.zeros((K,), dt)
    init = (g0, with_vma_of(jnp.asarray(True), g0))
    _, (gs, parents, alives) = jax.lax.scan(relax_step, init, base_all)
    gs = jnp.concatenate([jnp.where(k_idx == 0, 0.0, _INF)[None], gs])
    parents = jnp.concatenate([jnp.zeros((1, K), jnp.int32), parents])
    alives = jnp.concatenate([jnp.asarray([True]), alives])

    max_layer = jnp.max(jnp.where(alives & (jnp.arange(L) < n_layers),
                                  jnp.arange(L), 0))

    # Backtrack from the min-g node in the deepest reached layer (:430-447;
    # h is constant per layer so argmin f == argmin g), then expand with the
    # A*'s asymmetric thresholds (:458 upper, :471 lower).
    best_k_last = jnp.argmin(gs[max_layer])
    path_k = _backtrack(parents, max_layer, best_k_last, L, K)
    lower, upper = _expand_corridor(
        gm, ref_x, ref_y, ref_h, rough_lb, rough_ub, path_k, max_layer,
        1.3 * half_width, 1.2 * half_width)

    return Corridor(layers_s=layers_s, lower=lower, upper=upper,
                    n_layers=(max_layer + 1).astype(jnp.int32),
                    vehicle_l=vehicle_l, ok=ok)
