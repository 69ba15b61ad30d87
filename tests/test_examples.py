"""Smoke test for examples/quickstart.py — the user-facing walkthrough must
keep working as the API evolves (it exercises build_map, the Scenario
builder, solve_batch_jit, solve_batch_warm + advance_scenarios, and
viz.plot_result end to end). Slow tier: it compiles its own small-shape
pipeline variants."""

import os
import runpy
import sys

import pytest

pytestmark = pytest.mark.slow

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_quickstart_runs(tmp_path, capsys, monkeypatch):
    out_png = tmp_path / "quickstart.png"
    monkeypatch.setattr(sys, "argv", ["quickstart.py", "--out", str(out_png)])
    # No sys.path help: the script must resolve `bench`/`tpu_pathopt` itself
    # (it inserts its parent-parent), as `python examples/quickstart.py` does.
    runpy.run_path(os.path.join(_ROOT, "examples", "quickstart.py"),
                   run_name="__main__")
    text = capsys.readouterr().out
    assert "solved 8 scenarios: ok=8/8" in text
    assert "replanned (warm): ok=8/8" in text
    assert out_png.exists() and out_png.stat().st_size > 0
