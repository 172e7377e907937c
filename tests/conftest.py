"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's approach of validating CUDA kernels against pure
reference implementations (SURVEY.md section 4): every op test compares the
TPU-native implementation against an independently written golden (torch
builtins on CPU, or hand-computed values). Multi-device sharding tests use
the forced 8-device host platform.
"""

import os

# Tests always run on the virtual CPU mesh — the real chip is reserved for
# bench.py. The environment's sitecustomize force-registers the axon TPU
# platform and rewrites JAX_PLATFORMS, so the env var alone is not enough:
# override the config after import, before any backend is initialized.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the inversion-loop scan bodies are large
# XLA programs (~10 min cold compile on the single CPU core); cache them
# across test runs.
os.makedirs("/root/.cache/jax_test_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The full suite JITs hundreds of CPU executables in one process;
    XLA-CPU eventually segfaults inside backend_compile (observed twice
    at ~75 min / ~130 tests, on a trivial slice op). Dropping compiled
    executables at module boundaries keeps the process healthy; the
    on-disk persistent cache still avoids expensive recompiles."""
    yield
    jax.clear_caches()
