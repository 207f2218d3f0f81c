"""Test config: run on CPU with 8 virtual devices (multi-chip simulation).

The container's sitecustomize registers the axon TPU plugin and pins
``jax_platforms`` before env vars can take effect, so we override via
jax.config here (conftest is imported before any test module touches jax).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
