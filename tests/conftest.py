"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

This exercises the multi-chip sharding paths (pjit/psum over a Mesh) without
TPU hardware, per the framework's test strategy (SURVEY.md §4e).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache: first-compiles in this environment are slow
# (remote/throttled XLA compile), so cache every executable on disk.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax

# The environment's TPU plugin prepends its own platform to JAX_PLATFORMS,
# so the env var alone does not force CPU — override the config directly.
jax.config.update("jax_platforms", "cpu")
# The cache env vars are NOT honored in this environment either (verified:
# "cache is disabled/not initialized" + 1.0s min-compile-time despite the
# vars) — set the config explicitly or every CPU compile is repaid per run.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _release_executables_between_modules():
    """Drop live compiled executables after each test module.

    A single pytest process compiles many hundred XLA:CPU executables over
    the full suite; holding them all alive eventually crashes XLA late in
    the run (observed ~75% through: SIGSEGV in backend_compile_and_load /
    SIGABRT in deserialize_executable — each crashing test passes solo).
    The on-disk compilation cache makes re-loads cheap, so releasing the
    in-process caches per module trades a little reload time for not
    accumulating JIT state across 40+ modules.
    """
    yield
    jax.clear_caches()
