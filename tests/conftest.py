"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-device sharding is validated on CPU (the same XLA programs compile for
TPU); bench.py exercises the real chip. This environment pre-imports jax from
a sitecustomize hook with JAX_PLATFORMS=axon (remote TPU), so env vars set
here are too late — the platform must be forced through jax.config before any
backend client is created. XLA_FLAGS is still read at client creation, so
setting it here works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(42)
