"""Warm-started replanning stream (tpu_pathopt.replan): the reference
demo's 30 Hz re-solve loop (demo.cpp:133-211) as a batch, with the path-QP
state carried across cycles like OSQP's persistent solver object
(base_solver.cpp:97-117)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathopt import maps, pipeline, replan
from tpu_pathopt.config import PlannerConfig

# Small static shapes: the replan tests compile their own pipeline variant;
# keep it cheap (same shapes as the cli --small preview).
CFG = PlannerConfig(n_knots=64, n_segment_points=32, dp_layers=24,
                    bspline_samples=64)


@pytest.fixture(scope="module")
def corridor_map():
    res, size = 0.2, 300
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[:, np.abs(yy) >= 12.0] = True
    return maps.build_map(jnp.asarray(mask), resolution=res)


def _batch(B=2):
    R = 16
    raw_x = np.linspace(-25, 25, 8)
    raw_y = np.zeros(8)
    raw_x = np.concatenate([raw_x, np.full(R - 8, raw_x[-1])])
    raw_y = np.concatenate([raw_y, np.full(R - 8, raw_y[-1])])

    def make(off):
        return pipeline.Scenario(
            raw_x=jnp.asarray(raw_x, jnp.float32),
            raw_y=jnp.asarray(raw_y, jnp.float32),
            n_raw=jnp.asarray(8, jnp.int32),
            start_x=jnp.asarray(-25.0, jnp.float32),
            start_y=jnp.asarray(0.0, jnp.float32) + off,
            start_heading=jnp.asarray(0.0, jnp.float32),
            start_k=jnp.asarray(0.0, jnp.float32),
            target_x=jnp.asarray(25.0, jnp.float32),
            target_y=jnp.asarray(0.0, jnp.float32),
            target_heading=jnp.asarray(0.0, jnp.float32))

    offs = jnp.asarray(np.linspace(-1.0, 1.0, B), jnp.float32)
    return jax.vmap(make)(offs)


def test_warm_resolve_matches_cold(corridor_map):
    """Re-solving the SAME query warm-started must land on the cold
    solution within the solver tolerance (warm starting changes the start
    iterate, not the termination criterion) and must not iterate more."""
    scs = _batch(2)
    res_cold, warm = pipeline.solve_batch_warm(corridor_map, scs, CFG)
    assert bool(jnp.all(res_cold.ok))
    assert bool(jnp.all(warm.valid))
    res_warm, _ = pipeline.solve_batch_warm(corridor_map, scs, CFG,
                                            warm=warm)
    assert bool(jnp.all(res_warm.ok))
    nv = int(res_cold.n_valid[0])
    # Pointwise parity on the strongly-weighted coordinates (kappa,
    # d_heading); l sits in the w_l = 0 flat valley where two ADMM runs
    # stopping at 2e-3 legitimately land on different near-optima (same
    # ill-posedness the gridmap parity suite documents) — bound its drift.
    np.testing.assert_allclose(np.asarray(res_warm.k[:, :nv]),
                               np.asarray(res_cold.k[:, :nv]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(res_warm.d_heading[:, :nv]),
                               np.asarray(res_cold.d_heading[:, :nv]),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(res_warm.l[:, :nv]),
                               np.asarray(res_cold.l[:, :nv]), atol=5e-2)
    assert int(jnp.sum(res_warm.qp_iters)) <= int(jnp.sum(res_cold.qp_iters))


def test_advance_scenarios_moves_start_along_path(corridor_map):
    scs = _batch(2)
    res = pipeline.solve_batch_jit(corridor_map, scs, CFG)
    adv = replan.advance_scenarios(scs, res, ds=2.0)
    # Start moved ~2 m forward along a roughly straight path...
    dx = np.asarray(adv.start_x - scs.start_x)
    dy = np.asarray(adv.start_y - scs.start_y)
    dist = np.hypot(dx, dy)
    assert np.all(dist > 1.5) and np.all(dist < 2.5)
    # ...and the new pose sits ON the solved path (interpolated).
    for b in range(2):
        nv = int(res.n_valid[b])
        d = np.hypot(np.asarray(res.x[b][:nv]) - float(adv.start_x[b]),
                     np.asarray(res.y[b][:nv]) - float(adv.start_y[b]))
        assert d.min() < 0.2
    # Raw route unchanged.
    np.testing.assert_array_equal(np.asarray(adv.raw_x),
                                  np.asarray(scs.raw_x))


def test_replan_stream_warm_saves_iterations(corridor_map):
    """A short stream: every cycle succeeds, the fleet advances, and the
    warm-started cycles solve in no more iterations than the same stream
    run cold (the replanning payoff the bench measures)."""
    stats_warm = replan.replan_stream(corridor_map, _batch(2), CFG,
                                      n_steps=4, advance_ds=1.0)
    stats_cold = replan.replan_stream(corridor_map, _batch(2), CFG,
                                      n_steps=4, advance_ds=1.0,
                                      use_warm=False)
    assert stats_warm.n_ok == stats_warm.n_total
    assert stats_cold.n_ok == stats_cold.n_total
    # Cycle 0 is cold in both streams -> identical work.
    assert stats_warm.mean_iters_first == stats_cold.mean_iters_first
    assert stats_warm.mean_iters_rest <= stats_cold.mean_iters_rest


def test_replan_stream_sharded(corridor_map):
    """Sharded replanning over the 8-device virtual mesh: scenarios and
    their warm state shard together; every cycle succeeds and the warm
    carry still pays (fewer iterations on the warm cycles). Iteration
    counts may differ from the local stream by one residual-check interval
    (sharded compilation reassociates float reductions)."""
    from tpu_pathopt import dist

    mesh = dist.make_mesh()
    stats = replan.replan_stream_sharded(corridor_map, _batch(8), CFG, mesh,
                                         n_steps=3)
    assert stats.n_ok == stats.n_total
    # Iteration counts are quantized at the 25-iteration residual-check
    # interval and sit on convergence razor edges that flip with the
    # sharded compilation's float reassociation (which itself varies with
    # what else compiled in the process) — compare at interval granularity.
    # (No extra local-stream comparison here: this test already compiles
    # the large shard_map program, and a second full-pipeline compile in
    # the same worker risks the known XLA:CPU many-compiles segfault this
    # image exhibits — README "Verification".)
    assert stats.mean_iters_rest <= stats.mean_iters_first + 25.0

    # Batch not divisible by the mesh -> explicit error pointing at
    # pad_batch (raised before any compile).
    with pytest.raises(ValueError):
        replan.replan_stream_sharded(corridor_map, _batch(2), CFG, mesh,
                                     n_steps=1)


def test_advance_clamps_to_last_valid_knot():
    """Advancing past the end of a (truncated) path must land on the LAST
    VALID knot. res.s is constant past n_valid and jnp.interp at a repeated
    abscissa returns a PADDED entry (spline-extrapolated garbage) — round-5
    review finding, fixed by making the padded tail strictly increasing."""
    res, size = 0.2, 300
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res
    xx = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[:, np.abs(yy) >= 12.0] = True
    mask[np.abs(xx - 10.0) < 0.5, :] = True     # dead-end wall at x = 10
    gm = maps.build_map(jnp.asarray(mask), res)
    scs = _batch(2)
    out = pipeline.solve_batch_jit(gm, scs, CFG)
    assert bool(jnp.all(out.ok))
    adv = replan.advance_scenarios(scs, out, ds=500.0)   # far past the end
    for b in range(2):
        nv = int(out.n_valid[b])
        assert abs(float(adv.start_x[b]) - float(out.x[b][nv - 1])) < 1e-4
        assert abs(float(adv.start_y[b]) - float(out.y[b][nv - 1])) < 1e-4
