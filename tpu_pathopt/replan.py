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
        nx = jnp.interp(s_new, s, x)
        ny = jnp.interp(s_new, s, y)
        # Heading interpolated on the circle (robust to +-pi wraps).
        nh = jnp.arctan2(jnp.interp(s_new, s, jnp.sin(h)),
                         jnp.interp(s_new, s, jnp.cos(h)))
        nk = jnp.interp(s_new, s, k)
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


def replan_stream(gm: maps.GridMap, scs: pipeline.Scenario,
                  config: PlannerConfig, settings: QPSettings | None = None,
                  n_steps: int = 30, advance_ds: float = 1.0,
                  use_warm: bool = True, consume=None) -> ReplanStats:
    """Run ``n_steps`` replanning cycles over a scenario batch: the
    reference demo's 30 Hz loop (demo.cpp:133-211) as a batch. Cycles are
    dispatched back-to-back (each depends on the previous anyway) and
    synced once at the end; per-cycle results are handed to ``consume``
    while the device works on the next cycle."""
    B = int(scs.n_raw.shape[0])
    warm = pipeline.QPWarmStart.cold(B, config)
    iters, oks = [], []
    prev = None
    t0 = time.time()
    for step in range(n_steps):
        res, warm, scs = replan_step(gm, scs, warm, config, settings,
                                     advance_ds, use_warm)
        if prev is not None and consume is not None:
            consume(prev)
        prev = res
        iters.append(res.qp_iters)
        oks.append(res.ok)
    if prev is not None and consume is not None:
        consume(prev)
    # Cycles are strictly sequentially dependent, so fetching one leaf of
    # the LAST cycle syncs the whole stream; the stats stacking below is
    # bookkeeping, not serving work, and stays outside the timed window.
    np.asarray(iters[-1])
    dt = time.time() - t0
    it = np.asarray(jnp.stack(iters))
    ok = np.asarray(jnp.stack(oks))
    n_total = B * n_steps
    return ReplanStats(
        n_steps=n_steps, n_total=n_total, n_ok=int(ok.sum()),
        seconds=dt, solves_per_s=n_total / dt if dt > 0 else 0.0,
        mean_iters=float(it.mean()),
        mean_iters_first=float(it[0].mean()),
        mean_iters_rest=float(it[1:].mean()) if n_steps > 1 else float("nan"))


# --------------------------- sharded (multi-chip) ---------------------------

@functools.lru_cache(maxsize=16)
def _sharded_replan_step(mesh, config: PlannerConfig, settings: QPSettings,
                         advance_ds: float):
    """Cached jitted shard_map of one replanning cycle: scenarios AND the
    warm state shard together over the "scenarios" mesh axis (the warm
    carry is per-scenario, so it never crosses shards), the grid map is
    replicated, and the fleet iteration stats ride one psum — the
    multi-chip form of :func:`replan_step`. check_vma follows
    dist._sharded_solver_cached (off whenever Pallas kernels can engage)."""
    from jax.sharding import PartitionSpec as P

    pallas_engaged = jax.default_backend() in ("tpu", "axon")

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=not pallas_engaged,
        in_specs=(P(), P("scenarios"), P("scenarios")),
        out_specs=(P("scenarios"), P("scenarios"), P("scenarios"), P()),
    )
    def _run(gm_rep, scs, warm):
        res, warm_out = pipeline.solve_batch_warm(gm_rep, scs, config,
                                                  settings, warm=warm)
        scs_next = advance_scenarios(scs, res, advance_ds)
        n_ok = jax.lax.psum(jnp.sum(res.ok.astype(jnp.int32)), "scenarios")
        return res, warm_out, scs_next, n_ok

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
    iters, oks = [], []
    prev = None
    t0 = time.time()
    for _ in range(n_steps):
        res, warm, scs, _n_ok = run(gm, scs, warm)
        if prev is not None and consume is not None:
            consume(prev)
        prev = res
        iters.append(res.qp_iters)
        oks.append(res.ok)
    if prev is not None and consume is not None:
        consume(prev)
    np.asarray(iters[-1])
    dt = time.time() - t0
    it = np.asarray(jnp.stack(iters))
    ok = np.asarray(jnp.stack(oks))
    n_total = B * n_steps
    return ReplanStats(
        n_steps=n_steps, n_total=n_total, n_ok=int(ok.sum()),
        seconds=dt, solves_per_s=n_total / dt if dt > 0 else 0.0,
        mean_iters=float(it.mean()),
        mean_iters_first=float(it[0].mean()),
        mean_iters_rest=float(it[1:].mean()) if n_steps > 1 else float("nan"))
