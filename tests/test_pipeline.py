import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathopt import maps, pipeline
from tpu_pathopt.config import PlannerConfig

CFG = PlannerConfig()


@pytest.fixture(scope="module")
def corridor_map():
    """60x60 m corridor with an obstacle block on the upper side."""
    res, size = 0.2, 300
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res
    xx = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[:, np.abs(yy) >= 12.0] = True
    mask[np.ix_((xx >= -5) & (xx <= 0), (yy >= -1) & (yy <= 12))] = True
    return maps.build_map(jnp.asarray(mask), resolution=res)


def _scenario(start=(-25.0, 0.0, 0.0), target=(25.0, 0.0, 0.0)):
    R = 16
    raw_x = np.linspace(-25, 25, 8)
    raw_y = np.zeros(8)
    raw_x = np.concatenate([raw_x, np.full(R - 8, raw_x[-1])])
    raw_y = np.concatenate([raw_y, np.full(R - 8, raw_y[-1])])
    return pipeline.Scenario(
        raw_x=jnp.asarray(raw_x, jnp.float32),
        raw_y=jnp.asarray(raw_y, jnp.float32),
        n_raw=jnp.asarray(8, jnp.int32),
        start_x=jnp.asarray(start[0]), start_y=jnp.asarray(start[1]),
        start_heading=jnp.asarray(start[2]), start_k=jnp.asarray(0.0),
        target_x=jnp.asarray(target[0]), target_y=jnp.asarray(target[1]),
        target_heading=jnp.asarray(target[2]))


@pytest.fixture(scope="module")
def solved(corridor_map):
    return pipeline.solve_jit(corridor_map, _scenario(), CFG)


def test_pipeline_succeeds(solved):
    assert bool(solved.ok)
    assert not bool(solved.blocked)
    assert int(solved.n_valid) > 60


def test_path_avoids_obstacle(solved):
    nv = int(solved.n_valid)
    x = np.asarray(solved.x)[:nv]
    y = np.asarray(solved.y)[:nv]
    # Obstacle block spans x in [-5, 0], y in [-1, 12]; with half car width
    # 1 m the center must stay below y ~= -1.
    zone = (x >= -5.5) & (x <= 0.5)
    assert zone.any()
    assert y[zone].max() < -0.9


def test_path_respects_curvature_limit(solved):
    nv = int(solved.n_valid)
    k = np.asarray(solved.k)[:nv]
    assert np.abs(k).max() <= CFG.kappa_limit + 1e-3


def test_path_starts_at_vehicle(solved):
    # Initial-offset pin: the first path point is the vehicle position.
    assert abs(float(solved.x[0]) - (-25.0)) < 0.3
    assert abs(float(solved.y[0]) - 0.0) < 0.3


def test_blocked_scenario_truncates(corridor_map):
    res, size = 0.2, 300
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res
    xx = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[:, np.abs(yy) >= 12.0] = True
    mask[np.abs(xx - 10.0) < 0.5, :] = True     # full wall at x = 10
    gm = maps.build_map(jnp.asarray(mask), resolution=res)
    res_p = pipeline.solve_jit(gm, _scenario(), CFG)
    # DP cannot pass the wall either, so the candidate path ends before it.
    nv = int(res_p.n_valid)
    assert nv > 5
    x = np.asarray(res_p.x)[:nv]
    assert x.max() < 10.5


def test_batch_matches_single(corridor_map):
    starts = [(-25.0, 0.0, 0.0), (-25.0, 2.0, 0.1)]
    scs = [_scenario(start=st) for st in starts]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *scs)
    out = pipeline.solve_batch_jit(corridor_map, batch, CFG)
    assert bool(jnp.all(out.ok))
    single0 = pipeline.solve_jit(corridor_map, scs[0], CFG)
    nv = int(single0.n_valid)
    # vmapped and single compilations reassociate float reductions and ADMM
    # stops at tolerance, so agreement is only to the solver eps (2e-3).
    np.testing.assert_allclose(np.asarray(out.l[0][:nv]),
                               np.asarray(single0.l[:nv]), atol=2e-3)
