"""Shared setup for on-chip bench/smoke scripts.

The stage-1/stage-2 scans are multi-minute compiles through the axon
relay; a persistent compile cache (executables keyed by program +
compiler version) makes re-runs warm. Kept out of git — unlike the CPU
test cache, TPU executables are chip/runtime specific.
"""

from __future__ import annotations

import os


def setup_compile_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at the shared bench dir.

    Call immediately after ``import jax`` (before any tracing). Used by
    ``bench.py`` and ``scripts/smoke_fast_mode.py`` so the two never
    drift on cache location/thresholds.
    """
    import jax

    cache = path or os.environ.get("TGI_BENCH_CACHE",
                                   "/root/.cache/tgi_tpu_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    return cache
