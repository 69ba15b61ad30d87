"""Test configuration: force CPU with an 8-device virtual mesh so sharding
logic is exercised without TPU hardware, and enable x64 for oracle-parity
tests that need it."""

import os

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
