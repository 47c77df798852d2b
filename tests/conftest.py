"""Test configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4 "multi-node testing"):
sharding/collective tests exercise real `jax.sharding` paths without TPU pods,
and float64 is enabled so the reference's tight tolerances (down to 1e-7,
BASELINE.md) are checkable. Production TPU code paths are dtype-generic and run
f32/bf16 on device (see bench.py).

Must set env vars before importing jax anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin in this image overrides JAX_PLATFORMS at import time;
# force the CPU backend explicitly (must happen before first backend use).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
