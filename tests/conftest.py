"""Test configuration: force CPU with an 8-device virtual mesh so sharding
logic is exercised without TPU hardware, and enable x64 for oracle-parity
tests that need it.

Two test tiers (README "Verification"):

- default ``pytest -q``: skips tests marked ``slow`` (the gridmap.png
  end-to-end parity module and the multi-process distributed test, which
  dominate wall-clock via repeated XLA compiles) — the fast iteration loop.
- ``pytest -q --runslow``: the full suite (CI/nightly tier).

The persistent XLA compilation cache (shared with bench.py) makes warm
reruns of either tier far cheaper than the first run.
"""

import os

import pytest

# The environment pins JAX_PLATFORMS=axon (remote TPU tunnel); per-op dispatch
# over the tunnel is ~ms, so tests must run on local CPU with a virtual
# 8-device mesh for sharding coverage.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)  # default f32; tests opt in per-case

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (full CI tier)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running (gridmap parity / multi-process); "
        "skipped unless --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
