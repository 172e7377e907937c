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
# across test runs. The cache lives IN the repo (committed), so a fresh
# checkout on the same container image runs the suite warm (~15 min)
# instead of cold (45+ min) — /root/.cache does not survive across
# review environments. Override with TGI_JAX_CACHE.
_cache = os.environ.get(
    "TGI_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_test_cache"))
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
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
