"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; shardings are validated on
``--xla_force_host_platform_device_count=8`` per SURVEY.md §4's rebuild
test strategy.

NOTE: this environment pre-imports jax from a ``sitecustomize`` hook with
``JAX_PLATFORMS=axon`` (remote TPU), so setting the env var here is too
late — the config must be updated through ``jax.config`` before any
backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compile cache: the suite is compile-dominated (mono init and
# loop-closing tests spend minutes in XLA); repeat runs hit the cache.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# Enabled suite-wide (several geometry tests verify f64 numerics); the
# library itself must stay dtype-strict and run pure-f32 on TPU.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
