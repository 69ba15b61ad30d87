"""Smoke tests for the CLI demo driver and visualization.

The reference's de-facto fixture is its interactive RViz demo on gridmap.png
(/root/reference/src/test/demo.cpp); these tests run the CLI replacement
end-to-end: synthetic map and the gridmap.png default route, plus the
--profile (TimeRecorder) and failure-dump (logBoundsInfo) wiring.
"""

import os

import pytest

from tpu_pathopt import cli

GRIDMAP = "/root/reference/gridmap.png"


def test_cli_synthetic_small(tmp_path, capsys):
    out = tmp_path / "demo.png"
    cli.main(["--synthetic", "--small", "--out", str(out)])
    text = capsys.readouterr().out
    assert "solve: ok=True" in text
    assert out.exists() and out.stat().st_size > 0


@pytest.mark.skipif(not os.path.exists(GRIDMAP),
                    reason="reference gridmap.png not mounted")
def test_cli_gridmap_default_route(tmp_path, capsys):
    """The reference demo scenario: gridmap.png at 0.2 m/px (demo.cpp:94-113)
    with the CLI's default corridor route."""
    out = tmp_path / "gridmap_demo.png"
    cli.main(["--map", GRIDMAP, "--small", "--out", str(out)])
    text = capsys.readouterr().out
    assert "solve: ok=True" in text
    assert out.exists() and out.stat().st_size > 0


def test_cli_profile_prints_stage_times(tmp_path, capsys):
    out = tmp_path / "demo.png"
    cli.main(["--synthetic", "--small", "--profile", "--out", str(out)])
    text = capsys.readouterr().out
    for stage in ("prep", "smooth", "corridor", "post_smooth", "bounds",
                  "path_qp", "finalize"):
        assert f"{stage}:" in text, f"missing stage {stage} in profile output"


def test_cli_failure_dumps_bounds(tmp_path, capsys):
    """A start pose >75 deg off the reference fails processInitState
    (path_optimizer.cpp:113-116); the CLI must dump the corridor
    (logBoundsInfo equivalent) instead of a bare failure."""
    out = tmp_path / "demo.png"
    cli.main(["--synthetic", "--small", "--out", str(out),
              "--start=-25,0,1.6"])
    text = capsys.readouterr().out
    assert "solve: ok=False" in text
    assert "bounds dump:" in text
    assert "init=False" in text


def test_viz_draws_corridor_and_footprints(tmp_path):
    """The demo's debugging surface (demo.cpp:213-375): the rendered PNG
    carries the per-knot front/rear bound endpoints, vehicle rectangles and
    (for a dead-end) the blocked marker — not just the path."""
    import jax.numpy as jnp
    import numpy as np
    from tpu_pathopt import maps, pipeline, viz
    from tpu_pathopt.config import PlannerConfig

    cfg = PlannerConfig(n_knots=64, n_segment_points=32, dp_layers=24,
                        bspline_samples=64, qp_max_iter=1000)
    res, size = 0.4, 100
    mask = np.zeros((size, size), bool)
    yy = (0.5 * size - 0.5 - np.arange(size)) * res
    xx = (0.5 * size - 0.5 - np.arange(size)) * res
    mask[:, np.abs(yy) >= 6.0] = True
    gm_open = maps.build_map(jnp.asarray(mask), resolution=res)
    # Same map with a dead-end wall across the corridor.
    mask_wall = mask.copy()
    mask_wall[np.ix_((xx >= 4) & (xx <= 6), np.abs(yy) < 6.0)] = True
    gm_wall = maps.build_map(jnp.asarray(mask_wall), resolution=res)

    sc = cli.demo_scenario(
        [(-15, 0), (-10, 0), (-5, 0), (0, 0), (5, 0), (10, 0), (15, 0)],
        (-15.0, 0.0, 0.0), (15.0, 0.0, 0.0))

    res_open = pipeline.solve_jit(gm_open, sc, cfg)
    assert bool(res_open.ok)
    # The bounds carry the axle-anchor geometry the corridor is drawn from.
    assert res_open.bounds.front_x is not None
    assert res_open.bounds.heading.shape == res_open.bounds.front_lb.shape
    out = tmp_path / "corridor.png"
    viz.plot_result(gm_open, res_open, sc, path_out=str(out), config=cfg)
    assert out.exists() and out.stat().st_size > 0

    res_blocked = pipeline.solve_jit(gm_wall, sc, cfg)
    assert bool(res_blocked.blocked)
    out2 = tmp_path / "blocked.png"
    viz.plot_result(gm_wall, res_blocked, sc, path_out=str(out2), config=cfg)
    assert out2.exists() and out2.stat().st_size > 0


def test_cli_method_flags(tmp_path, capsys):
    """The reference demo is configured through gflags on its command line
    (--smoothing_method, planning_flags.cpp:27); the CLI must expose the
    live method toggles the same way."""
    out = tmp_path / "demo_tension_astar.png"
    cli.main(["--synthetic", "--small", "--smoothing-method", "TENSION",
              "--corridor-method", "ASTAR", "--out", str(out)])
    text = capsys.readouterr().out
    assert "solve: ok=True" in text
    assert out.exists() and out.stat().st_size > 0


def test_cli_verbose_qp_prints_residual_trace(tmp_path, capsys):
    """--verbose-qp prints the path QP's per-round residuals (the
    reference's OSQP verbose=true surface, base_solver.cpp:59)."""
    out = tmp_path / "demo.png"
    cli.main(["--synthetic", "--small", "--verbose-qp", "--out", str(out)])
    text = capsys.readouterr().out
    assert "per-round residuals" in text
    assert "pri_res" in text and "converged" in text
