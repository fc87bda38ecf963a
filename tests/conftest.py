"""Test config: run everything on CPU with 8 virtual devices so sharding
logic is exercised without TPU hardware.

This environment force-registers a TPU backend from sitecustomize before any
test code runs, so setting JAX_PLATFORMS alone is not enough -- we also
override the already-loaded jax config.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
