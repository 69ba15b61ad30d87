"""Scenario-sharded execution over a TPU mesh.

The reference is single-threaded and single-process (SURVEY.md §2.8); its only
"distributed" machinery is ROS pub/sub in the demo. The TPU-native engine
scales along the scenario batch axis instead:

- a 1-D ``Mesh`` over all devices (axis "scenarios"),
- ``shard_map`` of the batched pipeline with the batch dimension sharded,
- XLA collectives (``psum``/``pmax``) over ICI/DCN for fleet-wide aggregate
  metrics (convergence fraction, worst residual, iteration counts) — the
  cross-shard "residual reduction" of BASELINE.json.

Multi-host note: under ``jax.distributed`` the same code spans hosts; the mesh
covers all global devices and each host feeds its local shard.
"""

from __future__ import annotations

import functools
import time

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_pathopt import maps, pipeline
from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.qp.admm import QPSettings


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> int:
    """Initialize ``jax.distributed`` for a multi-process (multi-host) run.

    The reference is single-process (SURVEY.md §2.8 / §5.8); the TPU engine
    spans hosts through JAX's distributed runtime: one coordinator, one
    process per host, a global mesh over every chip. On TPU pods the
    arguments are auto-detected from the environment and may all be None;
    for CPU-based multi-process tests they are passed explicitly.

    No-op (returns current process count) when already initialized or when
    running single-process with no coordinator configured.
    """
    try:                                    # public API where available
        already_up = jax.distributed.is_initialized()
    except AttributeError:                  # older jax: fall back
        already_up = jax._src.distributed.global_state.client is not None
    if already_up:
        return jax.process_count()
    if coordinator_address is None and num_processes in (None, 1):
        return 1
    # shutdown_timeout: a host that finishes its last batch early waits at
    # the coordination shutdown barrier for the stragglers; the 300 s
    # default is too tight when hosts' workloads (or compiles) are skewed —
    # observed flaking the 2-process CI test under CPU contention.
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids,
                               shutdown_timeout_seconds=1200)
    return jax.process_count()


@flax.struct.dataclass
class FleetStats:
    """Globally reduced metrics (identical on every shard)."""

    n_total: jax.Array
    n_ok: jax.Array
    n_blocked: jax.Array
    max_qp_iters: jax.Array
    mean_qp_iters: jax.Array


def make_mesh(devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices), axis_names=("scenarios",))


def pallas_may_engage() -> bool:
    """True on backends where the engine's Pallas kernels (fused ADMM
    rounds, corridor DP forward) can run. shard_map's ``check_vma`` must be
    OFF exactly then — the varying-axes checker reaches into kernel jaxprs
    and rejects carries that cannot thread vma (see
    ``_sharded_solver_cached``). One predicate so every shard_map in the
    engine (dist, replan) applies the same policy; re-unify once Pallas
    threads vma through kernel carries."""
    return jax.default_backend() in ("tpu", "axon")


def pad_batch(scenarios: pipeline.Scenario, multiple: int):
    """Pad a scenario batch up to the next ``multiple`` by edge-replicating
    the last element. Returns (padded scenarios, valid mask (Bp,), B)."""
    B = scenarios.n_raw.shape[0]
    Bp = -(-B // multiple) * multiple
    if Bp != B:
        def pad(a):
            reps = jnp.broadcast_to(a[-1:], (Bp - B,) + a.shape[1:])
            return jnp.concatenate([a, reps], axis=0)
        scenarios = jax.tree_util.tree_map(pad, scenarios)
    return scenarios, jnp.arange(Bp) < B, B


def _sharded_solver(mesh: Mesh, config: PlannerConfig, settings: QPSettings,
                    with_stats: bool = True):
    """Build (and cache) the jitted sharded solve for one (mesh, config,
    settings). Caching the jit wrapper is essential: a fresh ``@jax.jit``
    closure per call would retrace AND recompile the full pipeline on every
    ``solve_sharded`` call — streaming would pay the whole compile per batch.

    Thin default-resolving wrapper so every call site hits the SAME
    lru_cache key regardless of whether it spells out ``with_stats``
    (positional defaults would otherwise split the cache and re-trace)."""
    return _sharded_solver_cached(mesh, config, settings, with_stats)


@functools.lru_cache(maxsize=16)
def _sharded_solver_cached(mesh: Mesh, config: PlannerConfig,
                           settings: QPSettings, with_stats: bool):
    # The jit wrapper is essential: an un-jitted shard_map evaluates its body
    # eagerly per shard. check_vma is scoped to the one known blocker: the
    # varying-axes checker reaches into Pallas kernels' jaxprs (the fused
    # ADMM round kernels' in-kernel fori_loop carries, and the corridor DP
    # forward kernel — corridor.dp_forward_batched engages on TPU backends
    # regardless of ``fused_rounds``) and reports carry-type mismatches the
    # surrounding program cannot fix (kernel ref loads/stores do not thread
    # vma), so the checker is OFF whenever ANY Pallas kernel can engage,
    # i.e. on TPU backends. On CPU meshes (virtual-device tests) it stays ON
    # to guard future collectives; the engine types its scan/while carries
    # from problem data (jaxutil.with_vma_of) to satisfy it. Re-unify once
    # Pallas threads vma through kernel carries.
    pallas_engaged = pallas_may_engage()

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=not pallas_engaged,
        in_specs=(P(), P("scenarios"), P("scenarios")),
        out_specs=(P("scenarios"), P()) if with_stats else P("scenarios"),
    )
    def _run(gm_rep, scs, valid):
        res = pipeline.solve_batch(gm_rep, scs, config, settings)
        if not with_stats:
            # Collective-free variant: identical per-shard program minus the
            # psum/pmax fleet reductions — used by measure_scaling to price
            # the collectives directly.
            return res
        vi = valid.astype(jnp.int32)
        n_total = jax.lax.psum(jnp.sum(vi), "scenarios")
        n_ok = jax.lax.psum(jnp.sum(res.ok.astype(jnp.int32) * vi),
                            "scenarios")
        n_blocked = jax.lax.psum(
            jnp.sum(res.blocked.astype(jnp.int32) * vi), "scenarios")
        max_iters = jax.lax.pmax(jnp.max(res.qp_iters * vi), "scenarios")
        sum_iters = jax.lax.psum(jnp.sum(res.qp_iters * vi), "scenarios")
        stats = FleetStats(
            n_total=n_total, n_ok=n_ok, n_blocked=n_blocked,
            max_qp_iters=max_iters,
            mean_qp_iters=sum_iters.astype(jnp.float32)
            / jnp.maximum(n_total, 1).astype(jnp.float32))
        return res, stats

    return _run


def solve_sharded(gm: maps.GridMap, scenarios: pipeline.Scenario,
                  config: PlannerConfig, mesh: Mesh,
                  settings: QPSettings | None = None, valid=None):
    """Solve a global batch sharded over the mesh. A batch that does not
    divide by the mesh size is padded by edge-replication and masked out of
    the fleet statistics; the result is sliced back to the caller's batch.
    Returns (PathResult sharded, FleetStats replicated).

    ``valid`` (global (B,) bool, sharded like the batch) marks real scenarios
    when the caller already padded — e.g. uneven per-host shards from
    ``make_global_batch(..., uneven=True)``. Padded entries are edge
    replicas: they solve (fixed shapes) but are excluded from FleetStats and
    the result is NOT sliced (the caller holds the mask)."""
    if settings is None:
        settings = config.qp_settings()
    if valid is None:
        n_shards = int(np.prod(mesh.devices.shape))
        scenarios, valid, B = pad_batch(scenarios, n_shards)
    else:
        B = None
    res, stats = _sharded_solver(mesh, config, settings)(gm, scenarios, valid)
    if B is not None and res.ok.shape[0] != B:
        res = jax.tree_util.tree_map(lambda a: a[:B], res)
    return res, stats


def make_global_batch(gm: maps.GridMap, local_scenarios: pipeline.Scenario,
                      mesh: Mesh, uneven: bool = False):
    """Assemble globally-sharded inputs from per-process local data.

    Under ``jax.distributed`` each host holds only its shard of the scenario
    batch; this builds the global ``jax.Array``s (batch axis sharded over the
    "scenarios" mesh axis, grid map replicated) that ``solve_sharded``'s jit
    consumes. Single-process it is equivalent to ``device_put`` with the same
    shardings, so the same driver code runs 1..N hosts unchanged.

    With ``uneven=True`` the per-process local batch sizes may differ (a
    straggler host with fewer scenarios must not wedge the fleet): every
    process learns the fleet-wide maximum via a host-level allgather, pads
    its local shard by edge-replication to that size (rounded up to its
    local device count), and the returned global ``valid`` mask marks the
    real scenarios. Returns (gm_g, scs_g) or, when uneven,
    (gm_g, scs_g, valid_g) — pass ``valid_g`` to ``solve_sharded``.
    """
    shard = NamedSharding(mesh, P("scenarios"))
    rep = NamedSharding(mesh, P())
    valid_local = None
    if uneven:
        from jax.experimental import multihost_utils
        B_local = int(jax.tree_util.tree_leaves(local_scenarios.n_raw)[0]
                      .shape[0])
        n_local_dev = sum(1 for d in mesh.devices.flat
                          if d.process_index == jax.process_index())
        # Allgather (batch, device count) pairs: with heterogeneous
        # per-process device counts every process must pad to the SAME
        # rows-per-device (the sharding is even across devices), so the
        # fleet-wide pad unit is max over processes of ceil(B_p / ndev_p).
        all_bd = np.asarray(multihost_utils.process_allgather(
            np.asarray([B_local, n_local_dev], np.int32))).reshape(-1, 2)
        per_dev = int(np.max(-(-all_bd[:, 0] // np.maximum(all_bd[:, 1], 1))))
        B_pad = per_dev * n_local_dev

        def pad(a):
            a = np.asarray(a)
            if a.shape[0] == B_pad:
                return a
            reps = np.broadcast_to(a[-1:], (B_pad - a.shape[0],) + a.shape[1:])
            return np.concatenate([a, reps], axis=0)

        local_scenarios = jax.tree_util.tree_map(pad, local_scenarios)
        valid_local = np.arange(B_pad) < B_local
    scs = jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(shard, np.asarray(a)),
        local_scenarios)
    gm_g = jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(rep, np.asarray(a)),
        gm)
    if not uneven:
        return gm_g, scs
    valid_g = jax.make_array_from_process_local_data(shard, valid_local)
    return gm_g, scs, valid_g


@flax.struct.dataclass
class StreamStats:
    """Aggregate over a streamed run (all shards identical)."""

    n_total: jax.Array
    n_ok: jax.Array
    n_blocked: jax.Array
    max_qp_iters: jax.Array
    sum_qp_iters: jax.Array


def solve_streamed(gm: maps.GridMap, scenario_batches, config: PlannerConfig,
                   mesh: Mesh, settings: QPSettings | None = None,
                   consume=None):
    """Stream INDEPENDENT scenario batches through the sharded solver.

    ``scenario_batches`` yields equal-shaped ``pipeline.Scenario`` batches
    (each divisible by the mesh size, so one compilation serves the whole
    stream), or ``(batch, valid)`` pairs for pre-padded uneven shards from
    ``make_global_batch(..., uneven=True)`` — a straggler host with fewer
    scenarios streams masked padding instead of wedging the fleet. What is
    carried across batches here is the COMPILATION only — batches are
    unrelated queries. For repeated solves of the same EVOLVING queries
    (the reference demo's 30 Hz loop) use ``tpu_pathopt.replan``, which
    additionally carries the per-scenario solver state (v, y, rho) — the
    true analogue of OSQP's warm-started repeated solves (SURVEY.md §5.4).
    Per-batch results are handed to ``consume`` (if given) while the
    next batch executes; fleet statistics accumulate across the stream
    (padded entries excluded). Returns (StreamStats, wall seconds, solves/s).
    """
    if settings is None:
        settings = config.qp_settings()
    total = None
    t0 = time.time()
    prev = None
    for item in scenario_batches:
        scs, valid = item if isinstance(item, tuple) else (item, None)
        res, stats = solve_sharded(gm, scs, config, mesh, settings,
                                   valid=valid)
        if prev is not None and consume is not None:
            consume(prev)           # overlap host consumption with device work
        prev = res
        s = StreamStats(n_total=stats.n_total, n_ok=stats.n_ok,
                        n_blocked=stats.n_blocked,
                        max_qp_iters=stats.max_qp_iters,
                        sum_qp_iters=(stats.mean_qp_iters
                                      * stats.n_total.astype(jnp.float32)))
        total = s if total is None else StreamStats(
            n_total=total.n_total + s.n_total,
            n_ok=total.n_ok + s.n_ok,
            n_blocked=total.n_blocked + s.n_blocked,
            max_qp_iters=jnp.maximum(total.max_qp_iters, s.max_qp_iters),
            sum_qp_iters=total.sum_qp_iters + s.sum_qp_iters)
    if prev is not None and consume is not None:
        consume(prev)
    if total is not None:
        jax.block_until_ready(total)
    dt = time.time() - t0
    n = int(total.n_total) if total is not None else 0
    return total, dt, (n / dt if dt > 0 else 0.0)


def measure_scaling(gm: maps.GridMap, make_batch, config: PlannerConfig,
                    settings: QPSettings | None = None, devices=None,
                    per_shard: int = 8, reps: int = 10):
    """Weak-scaling measurement of the sharded solve, 1 device vs all, with a
    MATCHED per-device batch so batch-size amortization cannot confound the
    ratio: the 1-device mesh solves ``per_shard`` scenarios, the full mesh
    solves ``per_shard`` scenarios PER DEVICE (same per-shard program, same
    shapes — one compile serves both runs).

    Reported numbers:

    - ``per_dev_solves_per_s_{1dev,full}``: throughput divided by device
      count — the weak-scaling series. ``scaling_efficiency`` is their ratio
      (the BASELINE.md >= 0.8 target on real multi-chip hardware, where each
      device owns its compute).
    - ``collective_overhead_frac``: directly measured price of the psum/pmax
      fleet reductions — the same full-mesh solve with and without the
      collectives, (t_with - t_without) / t_without.
    - ``machine_ratio_full_vs_1dev``: total full-mesh throughput over total
      1-device throughput. On a VIRTUAL mesh (n CPU "devices" oversubscribing
      the same physical cores, where one device's XLA already uses every core
      via intra-op threads) per-device efficiency is capped near 1/n by the
      hardware, and THIS ratio is the meaningful signal instead: ~1.0 means
      the sharded program runs at the machine ceiling with no sharding
      overhead.
    - ``*_spread_frac``: per-measurement relative spread (half the
      min->max range of the per-rep rates over the median). Any derived
      ratio whose distance from its null value is within the combined
      spread of its operands is NOISE and must be read as such — round 4
      printed a -18% "collective overhead" from reps=3 with no variance
      reporting, which this exists to prevent.
    """
    if settings is None:
        settings = config.qp_settings()
    devices = jax.devices() if devices is None else devices
    n_dev = len(devices)

    def timed(mesh, batch, with_stats=True):
        """(median solves/s, relative half-spread of the per-rep rates)."""
        scs = make_batch(batch)
        scs, valid, _ = pad_batch(scs, int(np.prod(mesh.devices.shape)))
        run = _sharded_solver(mesh, config, settings, with_stats)
        res = run(gm, scs, valid)      # warm/compile
        jax.block_until_ready(res)
        rates = []
        for _ in range(reps):
            t0 = time.time()
            res = run(gm, scs, valid)
            jax.block_until_ready(res)
            rates.append(batch / (time.time() - t0))
        med = float(np.median(rates))
        spread = float((np.max(rates) - np.min(rates)) / 2.0 / med)
        return med, spread

    mesh1 = make_mesh(devices[:1])
    mesh_n = make_mesh(devices)
    sps_1, spr_1 = timed(mesh1, per_shard)
    sps_n, spr_n = timed(mesh_n, per_shard * n_dev)
    sps_n_nostats, spr_ns = timed(mesh_n, per_shard * n_dev, with_stats=False)
    per_dev_1 = sps_1
    per_dev_n = sps_n / n_dev
    eff = per_dev_n / per_dev_1 if per_dev_1 > 0 else 0.0
    overhead = (sps_n_nostats / sps_n - 1.0) if sps_n > 0 else 0.0
    # The overhead estimate subtracts two measurements; its noise floor is
    # their combined spread.
    overhead_noise = spr_n + spr_ns
    return {"n_devices": n_dev, "per_shard": per_shard, "reps": reps,
            "per_dev_solves_per_s_1dev": per_dev_1,
            "per_dev_solves_per_s_full": per_dev_n,
            "solves_per_s_1dev": sps_1, "solves_per_s_full": sps_n,
            "spread_frac_1dev": spr_1, "spread_frac_full": spr_n,
            "scaling_efficiency": eff,
            "collective_overhead_frac": overhead,
            "collective_overhead_noise_frac": overhead_noise,
            "collective_overhead_is_noise": bool(
                abs(overhead) <= overhead_noise),
            "machine_ratio_full_vs_1dev": (sps_n / sps_1 if sps_1 else 0.0)}
