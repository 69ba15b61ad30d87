import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathopt import dist, maps, pipeline
from tpu_pathopt.config import PlannerConfig
from tpu_pathopt.qp.admm import QPSettings

TINY = PlannerConfig(n_knots=16, n_segment_points=16, dp_layers=8,
                     dp_laterals=9, bspline_samples=32, qp_max_iter=100)
ST = QPSettings(max_iter=100)


def _inputs(batch):
    res, size = 0.4, 100
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[:, np.abs(yy) >= 15.0] = True
    gm = maps.build_map(jnp.asarray(mask), resolution=res)
    R = 8
    raw_x = np.concatenate([np.linspace(-12, 12, 6), np.full(R - 6, 12.0)])
    raw_y = np.zeros(R)

    def make(off):
        return pipeline.Scenario(
            raw_x=jnp.asarray(raw_x, jnp.float32),
            raw_y=jnp.asarray(raw_y, jnp.float32),
            n_raw=jnp.asarray(6, jnp.int32),
            start_x=jnp.asarray(-12.0, jnp.float32),
            start_y=jnp.asarray(0.0, jnp.float32) + off,
            start_heading=jnp.asarray(0.0, jnp.float32),
            start_k=jnp.asarray(0.0, jnp.float32),
            target_x=jnp.asarray(12.0, jnp.float32),
            target_y=jnp.asarray(0.0, jnp.float32),
            target_heading=jnp.asarray(0.0, jnp.float32))

    offs = jnp.asarray(np.linspace(-0.5, 0.5, batch), jnp.float32)
    return gm, jax.vmap(make)(offs)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_solve_matches_local():
    gm, scs = _inputs(16)
    mesh = dist.make_mesh(jax.devices()[:8])
    res_sh, stats = dist.solve_sharded(gm, scs, TINY, mesh, ST)
    assert int(stats.n_total) == 16
    res_local = pipeline.solve_batch_jit(gm, scs, TINY, ST)
    assert int(stats.n_ok) == int(jnp.sum(res_local.ok.astype(jnp.int32)))
    nv = np.asarray(res_local.n_valid)
    np.testing.assert_array_equal(np.asarray(res_sh.n_valid), nv)
    np.testing.assert_allclose(np.asarray(res_sh.l), np.asarray(res_local.l),
                               atol=5e-3)


def test_graft_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.x.shape[0] == 64


def test_graft_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_streamed_solve_accumulates_fleet_stats():
    gm, scs = _inputs(16)
    mesh = dist.make_mesh(jax.devices()[:8])
    consumed = []
    total, dt, sps = dist.solve_streamed(
        gm, (scs for _ in range(3)), TINY, mesh, ST,
        consume=lambda r: consumed.append(np.asarray(r.ok)))
    assert int(total.n_total) == 48
    assert len(consumed) == 3
    res_local = pipeline.solve_batch_jit(gm, scs, TINY, ST)
    assert int(total.n_ok) == 3 * int(jnp.sum(res_local.ok.astype(jnp.int32)))
    assert sps > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_measure_scaling_reports_efficiency():
    gm, scs16 = _inputs(16)

    def make_batch(b):
        return jax.tree_util.tree_map(lambda a: a[:b], scs16)

    sc = dist.measure_scaling(gm, make_batch, TINY, ST,
                              devices=jax.devices()[:8], per_shard=1, reps=1)
    assert sc["n_devices"] == 8
    assert sc["solves_per_s_1dev"] > 0 and sc["solves_per_s_full"] > 0
    assert sc["scaling_efficiency"] > 0
    # Matched-per-device design: per-device rates and the directly measured
    # collective price must be reported alongside the machine-total ratio.
    assert sc["per_dev_solves_per_s_1dev"] == sc["solves_per_s_1dev"]
    assert sc["per_dev_solves_per_s_full"] == sc["solves_per_s_full"] / 8
    assert sc["machine_ratio_full_vs_1dev"] > 0
    assert "collective_overhead_frac" in sc


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_make_global_batch_single_process_roundtrip():
    gm, scs = _inputs(16)
    mesh = dist.make_mesh(jax.devices()[:8])
    gm_g, scs_g = dist.make_global_batch(gm, scs, mesh)
    res_sh, stats = dist.solve_sharded(gm_g, scs_g, TINY, mesh, ST)
    assert int(stats.n_total) == 16
    res_local = pipeline.solve_batch_jit(gm, scs, TINY, ST)
    np.testing.assert_allclose(np.asarray(res_sh.l), np.asarray(res_local.l),
                               atol=5e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_solve_pads_non_divisible_batch():
    """Batch 13 on an 8-device mesh: padded to 16 internally, result sliced
    back, stats count only the 13 real scenarios."""
    gm, scs = _inputs(13)
    mesh = dist.make_mesh(jax.devices()[:8])
    res_sh, stats = dist.solve_sharded(gm, scs, TINY, mesh, ST)
    assert int(stats.n_total) == 13
    assert res_sh.ok.shape[0] == 13
    res_local = pipeline.solve_batch_jit(gm, scs, TINY, ST)
    assert int(stats.n_ok) == int(jnp.sum(res_local.ok.astype(jnp.int32)))
    np.testing.assert_allclose(np.asarray(res_sh.l), np.asarray(res_local.l),
                               atol=5e-3)
