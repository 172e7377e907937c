"""Tracing / profiling utilities.

Behavioral parity target: torch_utils/misc.py:102-111 (profiled_function /
record_function scopes) and the per-phase CUDA event timing of
training_loop.py:219-225 — mapped to jax.profiler named traces and
block_until_ready deltas (SURVEY.md section 5.1).
"""

from __future__ import annotations

import contextlib
import functools
import time

import jax


def profiled_function(fn):
    """Annotate a function in profiler traces (misc.profiled_function)."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.profiler.TraceAnnotation(fn.__name__):
            return fn(*args, **kwargs)
    return wrapper


@contextlib.contextmanager
def record_scope(name: str):
    """Named trace scope (torch.autograd.profiler.record_function)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class PhaseTimer:
    """Wall-clock phase timing with device sync, the TPU analog of the
    reference's CUDA start/end events. Accumulates {name: seconds}."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def means_ms(self) -> dict[str, float]:
        return {k: self.totals[k] / self.counts[k] * 1e3 for k in self.totals}


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a full device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def check_numerics(tree, name="tree"):
    """Debug-mode NaN/Inf check over a pytree (reference nan_to_num +
    jax_debug_nans analog for explicit call sites)."""
    import jax.numpy as jnp
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if not bool(jnp.isfinite(leaf).all()):
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:10]}")
