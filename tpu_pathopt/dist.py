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

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tpu_pathopt import maps, pipeline
from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.qp.admm import QPSettings


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
