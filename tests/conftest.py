"""Test configuration: run on CPU with 8 virtual devices so the multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4).

Note: this environment pre-imports jax via sitecustomize (axon TPU plugin),
so JAX_PLATFORMS in the environment is already consumed; jax.config.update
is the reliable override.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
