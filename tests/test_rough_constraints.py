import numpy as np
import jax.numpy as jnp
from tpu_pathopt import maps, pipeline
from tpu_pathopt.config import PlannerConfig


def test_pipeline_rough_constraints_far_away():
    """rough_constraints_far_away=True: knots past 30 m use a single
    center-corridor row (base_solver.cpp:25-37); the pipeline still dodges
    obstacles in the precise region and stays in-corridor beyond it."""
    res, size = 0.2, 300
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res
    xx = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[:, np.abs(yy) >= 12.0] = True
    mask[np.ix_((xx >= -15) & (xx <= -10), (yy >= -1) & (yy <= 12))] = True
    gm = maps.build_map(jnp.asarray(mask), resolution=res)
    raw_x = np.concatenate([np.linspace(-25, 25, 8), np.full(8, 25.0)])
    sc = pipeline.Scenario(
        raw_x=jnp.asarray(raw_x, jnp.float32),
        raw_y=jnp.zeros((16,), jnp.float32),
        n_raw=jnp.asarray(8, jnp.int32),
        start_x=jnp.asarray(-25.0), start_y=jnp.asarray(0.0),
        start_heading=jnp.asarray(0.0), start_k=jnp.asarray(0.0),
        target_x=jnp.asarray(25.0), target_y=jnp.asarray(0.0),
        target_heading=jnp.asarray(0.0))
    cfg = PlannerConfig(rough_constraints_far_away=True)
    out = pipeline.solve_jit(gm, sc, cfg)
    assert bool(out.ok)
    nv = int(out.n_valid)
    x = np.asarray(out.x)[:nv]
    y = np.asarray(out.y)[:nv]
    zone = (x >= -15.5) & (x <= -9.5)
    assert zone.any()
    assert y[zone].max() < -0.9          # still dodges in the precise region
    far = np.asarray(out.s)[:nv] >= 30.0
    assert far.any()
    assert (np.abs(y[far]) < 11.0).all() # in-corridor beyond precise horizon
