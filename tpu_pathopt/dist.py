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
    if jax._src.distributed.global_state.client is not None:  # already up
        return jax.process_count()
    if coordinator_address is None and num_processes in (None, 1):
        return 1
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
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


def solve_sharded(gm: maps.GridMap, scenarios: pipeline.Scenario,
                  config: PlannerConfig, mesh: Mesh,
                  settings: QPSettings = QPSettings()):
    """Solve a global batch sharded over the mesh. A batch that does not
    divide by the mesh size is padded by edge-replication and masked out of
    the fleet statistics; the result is sliced back to the caller's batch.
    Returns (PathResult sharded, FleetStats replicated)."""
    n_shards = int(np.prod(mesh.devices.shape))
    scenarios, valid, B = pad_batch(scenarios, n_shards)

    # The jit wrapper is essential: an un-jitted shard_map evaluates its body
    # eagerly per shard. check_vma stays ON — every scan/while carry in the
    # engine derives its varying-axes type from problem data
    # (jaxutil.with_vma_of), so the checker can guard future collectives.
    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("scenarios"), P("scenarios")),
        out_specs=(P("scenarios"), P()),
    )
    def _run(gm_rep, scs, valid):
        res = pipeline.solve_batch(gm_rep, scs, config, settings)
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

    res, stats = _run(gm, scenarios, valid)
    if res.ok.shape[0] != B:
        res = jax.tree_util.tree_map(lambda a: a[:B], res)
    return res, stats


def make_global_batch(gm: maps.GridMap, local_scenarios: pipeline.Scenario,
                      mesh: Mesh):
    """Assemble globally-sharded inputs from per-process local data.

    Under ``jax.distributed`` each host holds only its shard of the scenario
    batch; this builds the global ``jax.Array``s (batch axis sharded over the
    "scenarios" mesh axis, grid map replicated) that ``solve_sharded``'s jit
    consumes. Single-process it is equivalent to ``device_put`` with the same
    shardings, so the same driver code runs 1..N hosts unchanged.
    """
    shard = NamedSharding(mesh, P("scenarios"))
    rep = NamedSharding(mesh, P())
    scs = jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(shard, np.asarray(a)),
        local_scenarios)
    gm_g = jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(rep, np.asarray(a)),
        gm)
    return gm_g, scs


@flax.struct.dataclass
class StreamStats:
    """Aggregate over a streamed run (all shards identical)."""

    n_total: jax.Array
    n_ok: jax.Array
    n_blocked: jax.Array
    max_qp_iters: jax.Array
    sum_qp_iters: jax.Array


def solve_streamed(gm: maps.GridMap, scenario_batches, config: PlannerConfig,
                   mesh: Mesh, settings: QPSettings = QPSettings(),
                   consume=None):
    """Stream scenario batches through the sharded solver.

    ``scenario_batches`` yields equal-shaped ``pipeline.Scenario`` batches
    (each divisible by the mesh size, so one compilation serves the whole
    stream — the multi-host analogue of OSQP's warm-started repeated solves,
    SURVEY.md §5.4). Per-batch results are handed to ``consume`` (if given)
    while the next batch executes; fleet statistics accumulate across the
    stream. Returns (StreamStats, wall seconds, solves/s).
    """
    total = None
    t0 = time.time()
    prev = None
    for scs in scenario_batches:
        res, stats = solve_sharded(gm, scs, config, mesh, settings)
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
                    settings: QPSettings = QPSettings(), devices=None,
                    per_shard: int = 2, reps: int = 3):
    """Weak-scaling efficiency of the sharded solve, 1 device vs all.

    ``make_batch(b)`` builds a ``b``-scenario batch. Runs ``per_shard``
    scenarios per device on a 1-device mesh and on the full mesh, timing
    ``reps`` executions after a warmup; efficiency = solves/s(full mesh) /
    (n_devices * solves/s(1 device)) — the BASELINE.md >= 80% scaling target
    is measured exactly this way. Returns a dict of the numbers.
    """
    devices = jax.devices() if devices is None else devices
    n_dev = len(devices)

    def timed(mesh, batch):
        scs = make_batch(batch)
        res, _ = solve_sharded(gm, scs, config, mesh, settings)   # warm/comp
        jax.block_until_ready(res.x)
        t0 = time.time()
        for _ in range(reps):
            res, _ = solve_sharded(gm, scs, config, mesh, settings)
            jax.block_until_ready(res.x)
        return batch * reps / (time.time() - t0)

    sps_1 = timed(make_mesh(devices[:1]), per_shard)
    sps_n = timed(make_mesh(devices), per_shard * n_dev)
    eff = sps_n / (n_dev * sps_1) if sps_1 > 0 else 0.0
    return {"n_devices": n_dev, "solves_per_s_1dev": sps_1,
            "solves_per_s_full": sps_n, "scaling_efficiency": eff}
