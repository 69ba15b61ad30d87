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
