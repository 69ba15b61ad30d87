"""Warm-started replanning stream — the serving loop for evolving queries.

The reference demo re-solves the SAME query at 30 Hz as the vehicle moves
(reference: src/test/demo.cpp:133-211 — the timer callback re-runs
``PathOptimizer::solve`` with the updated vehicle pose against the same
clicked reference points), and OSQP's persistent solver object makes every
re-solve warm-started (base_solver.cpp:97-117). This module is the batched
TPU analogue: a whole fleet of scenarios advances along its solved paths and
re-solves each cycle, with the path-QP state (v, y, rho) carried between
cycles via :class:`pipeline.QPWarmStart`.

Everything per-cycle is ONE jitted program (solve + state carry + scenario
advance), so a stream of cycles dispatches back-to-back like
``dist.solve_streamed`` batches. Warm starting changes only the ADMM start
iterate — solutions still terminate at the same OSQP tolerances, so
warm-vs-cold solutions agree within the 2e-3 eps (pinned by
tests/test_replan.py).
"""

from __future__ import annotations

import functools
import time

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathopt import maps, pipeline
from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.qp.admm import QPSettings


def advance_scenarios(scs: pipeline.Scenario, res: pipeline.PathResult,
                      ds: float) -> pipeline.Scenario:
    """Advance each scenario's start pose ``ds`` meters along its solved
    path (the vehicle driving the plan for one cycle — what the reference
    demo's simulated clock does between solves). The raw reference points
    (the route) are unchanged. Lanes that failed (``res.ok`` False) keep
    their previous pose — they retry, like the reference demo logging the
    failure and re-planning next tick (demo.cpp:150-156)."""

    def adv(sc, x, y, h, k, s, n_valid, ok):
        s_end = jnp.take(s, jnp.maximum(n_valid - 1, 0))
        s_new = jnp.clip(jnp.asarray(ds, s.dtype), 0.0, s_end)
        # res.s is CONSTANT past n_valid (stage_finalize zeroes padded
        # segment lengths), and jnp.interp at a repeated x returns the
        # LAST matching entry — a padded knot holding spline-extrapolated
        # garbage. Make the padded tail strictly increasing so a query at
        # s_end resolves to the last VALID knot; queries below s_end are
        # unaffected (the valid prefix is unchanged).
        i = jnp.arange(s.shape[0])
        sq = s + jnp.where(i >= n_valid,
                           (i - n_valid + 1).astype(s.dtype) * 1e-3, 0.0)
        nx = jnp.interp(s_new, sq, x)
        ny = jnp.interp(s_new, sq, y)
        # Heading interpolated on the circle (robust to +-pi wraps).
        nh = jnp.arctan2(jnp.interp(s_new, sq, jnp.sin(h)),
                         jnp.interp(s_new, sq, jnp.cos(h)))
        nk = jnp.interp(s_new, sq, k)
        return sc.replace(
            start_x=jnp.where(ok, nx, sc.start_x),
            start_y=jnp.where(ok, ny, sc.start_y),
            start_heading=jnp.where(ok, nh, sc.start_heading),
            start_k=jnp.where(ok, nk, sc.start_k))

    return jax.vmap(adv)(scs, res.x, res.y, res.heading, res.k, res.s,
                         res.n_valid, res.ok)


@functools.partial(jax.jit,
                   static_argnames=("config", "settings", "advance_ds",
                                    "use_warm"))
def replan_step(gm: maps.GridMap, scs: pipeline.Scenario,
                warm: pipeline.QPWarmStart, config: PlannerConfig,
                settings: QPSettings | None = None, advance_ds: float = 1.0,
                use_warm: bool = True):
    """One replanning cycle under one jit: solve (warm-started), carry the
    solver state, advance the fleet along the solved paths. Returns
    ``(PathResult, QPWarmStart, Scenario)``. ``use_warm=False`` runs the
    identical cycle cold (for measuring what warm starting buys)."""
    res, warm_out = pipeline.solve_batch_warm(
        gm, scs, config, settings, warm=warm if use_warm else None)
    scs_next = advance_scenarios(scs, res, advance_ds)
    return res, warm_out, scs_next


@flax.struct.dataclass
class ReplanStats:
    """Host-side summary of a replanning stream."""

    n_steps: int
    n_total: int                 # scenarios x steps
    n_ok: int
    seconds: float
    solves_per_s: float
    mean_iters: float            # ADMM iters per solve, mean over the stream
    mean_iters_first: float      # cycle 0 (always cold)
    mean_iters_rest: float       # cycles 1.. (warm when enabled)


def _drive_stream(step, scs, warm, n_steps: int, consume) -> ReplanStats:
    """Shared drive loop for the local and sharded streams: dispatch
    ``n_steps`` cycles back-to-back (each depends on the previous anyway),
    hand per-cycle results to ``consume`` while the device works on the
    next cycle, and sync ONCE by fetching a leaf of the last cycle (cycles
    are strictly sequentially dependent, so that syncs the whole stream);
    the stats stacking is bookkeeping, not serving work, and stays outside
    the timed window.

    ``step(scs, warm) -> (PathResult, warm, scs, (n_ok, sum_iters))`` —
    the per-cycle stats are () scalars so they are host-fetchable on every
    process (on a multi-host mesh the sharded ``res`` fields are not; the
    sharded step computes them with psum).

    Timing note: on FIRST use in a process, cycle 0's jit compile lands in
    ``seconds`` — for throughput measurement, pre-warm with a short stream
    first (``bench.replan_bench`` does; its numbers are steady-state)."""
    if n_steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")
    B = int(scs.n_raw.shape[0])
    n_oks, sum_iters = [], []
    prev = None
    t0 = time.time()
    for _ in range(n_steps):
        res, warm, scs, (n_ok, s_it) = step(scs, warm)
        if prev is not None and consume is not None:
            consume(prev)
        prev = res
        n_oks.append(n_ok)
        sum_iters.append(s_it)
    if prev is not None and consume is not None:
        consume(prev)
    np.asarray(sum_iters[-1])
    dt = time.time() - t0
    it = np.asarray(jnp.stack(sum_iters), dtype=np.float64) / B
    n_ok_total = int(np.sum(np.asarray(jnp.stack(n_oks))))
    n_total = B * n_steps
    return ReplanStats(
        n_steps=n_steps, n_total=n_total, n_ok=n_ok_total,
        seconds=dt, solves_per_s=n_total / dt if dt > 0 else 0.0,
        mean_iters=float(it.mean()),
        mean_iters_first=float(it[0]),
        mean_iters_rest=float(it[1:].mean()) if n_steps > 1 else float("nan"))


def replan_stream(gm: maps.GridMap, scs: pipeline.Scenario,
                  config: PlannerConfig, settings: QPSettings | None = None,
                  n_steps: int = 30, advance_ds: float = 1.0,
                  use_warm: bool = True, consume=None) -> ReplanStats:
    """Run ``n_steps`` replanning cycles over a scenario batch: the
    reference demo's 30 Hz loop (demo.cpp:133-211) as a batch. See
    :func:`_drive_stream` for the dispatch/sync pattern."""
    warm = pipeline.QPWarmStart.cold(int(scs.n_raw.shape[0]), config)

    def step(scs_i, warm_i):
        res, warm_o, scs_o = replan_step(gm, scs_i, warm_i, config, settings,
                                         advance_ds, use_warm)
        stats = (jnp.sum(res.ok.astype(jnp.int32)), jnp.sum(res.qp_iters))
        return res, warm_o, scs_o, stats

    return _drive_stream(step, scs, warm, n_steps, consume)


# --------------------------- sharded (multi-chip) ---------------------------

@functools.lru_cache(maxsize=16)
def _sharded_replan_step(mesh, config: PlannerConfig, settings: QPSettings,
                         advance_ds: float):
    """Cached jitted shard_map of one replanning cycle: scenarios AND the
    warm state shard together over the "scenarios" mesh axis (the warm
    carry is per-scenario, so it never crosses shards), the grid map is
    replicated, and the fleet iteration stats ride one psum — the
    multi-chip form of :func:`replan_step`."""
    from jax.sharding import PartitionSpec as P

    from tpu_pathopt import dist  # local import: replan <-> dist layering

    # One shared policy for every shard_map in the engine.
    pallas_engaged = dist.pallas_may_engage()

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=not pallas_engaged,
        in_specs=(P(), P("scenarios"), P("scenarios")),
        out_specs=(P("scenarios"), P("scenarios"), P("scenarios"), P(), P()),
    )
    def _run(gm_rep, scs, warm):
        res, warm_out = pipeline.solve_batch_warm(gm_rep, scs, config,
                                                  settings, warm=warm)
        scs_next = advance_scenarios(scs, res, advance_ds)
        # Replicated fleet scalars: on a multi-host mesh the sharded res
        # fields are not host-fetchable, so the stream stats ride psums.
        n_ok = jax.lax.psum(jnp.sum(res.ok.astype(jnp.int32)), "scenarios")
        sum_iters = jax.lax.psum(jnp.sum(res.qp_iters), "scenarios")
        return res, warm_out, scs_next, n_ok, sum_iters

    return _run


def replan_stream_sharded(gm: maps.GridMap, scs: pipeline.Scenario,
                          config: PlannerConfig, mesh,
                          settings: QPSettings | None = None,
                          n_steps: int = 30, advance_ds: float = 1.0,
                          consume=None) -> ReplanStats:
    """:func:`replan_stream` over a device mesh: each shard owns its
    scenarios and their warm state end-to-end across cycles (no cross-shard
    traffic beyond the fleet-ok psum). The batch must divide the mesh size;
    pad with ``dist.pad_batch`` first if it doesn't."""
    from tpu_pathopt import dist  # local import: replan <-> dist layering

    if settings is None:
        settings = config.qp_settings()
    B = int(scs.n_raw.shape[0])
    n_shards = int(np.prod(mesh.devices.shape))
    if B % n_shards:
        raise ValueError(f"batch {B} must divide the mesh size {n_shards}; "
                         "pad with dist.pad_batch")
    run = _sharded_replan_step(mesh, config, settings, advance_ds)
    warm = pipeline.QPWarmStart.cold(B, config)

    def step(scs_i, warm_i):
        res, warm_o, scs_o, n_ok, sum_iters = run(gm, scs_i, warm_i)
        return res, warm_o, scs_o, (n_ok, sum_iters)

    return _drive_stream(step, scs, warm, n_steps, consume)
