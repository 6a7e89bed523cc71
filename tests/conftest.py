"""Test configuration: force an 8-device virtual CPU platform.

Tests never touch real TPU hardware; multi-chip sharding tests run on
XLA's host platform with 8 virtual devices (SURVEY.md §4 item 4).  The env
vars must be set before jax initialises its backends, hence module level in
conftest (imported before any test module).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep test compiles fast and deterministic.
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: repeated jit of the same tiny programs across
# tests/runs hits disk instead of recompiling (minutes → seconds).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepbinner_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax

# The axon sitecustomize force-sets jax_platforms="axon,cpu" from inside
# register(), which overrides the env var — only a config.update after import
# wins.  Without this, "CPU" tests silently run on the real TPU chip with a
# single-device mesh and the 8-device sharding tests test nothing.
jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()} "
    f"({jax.devices()[:2]}...)"
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
