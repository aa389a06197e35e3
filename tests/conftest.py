"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware (and unit tests stay deterministic/fast).

Note: this image boots with a sitecustomize that registers a tunneled TPU
backend and pins ``JAX_PLATFORMS=axon``; the env var is therefore already
consumed by the time pytest imports us, so the override must go through
``jax.config`` before the first backend use."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
