"""Cross-process training statistics.

Behavioral parity target: torch_utils/training_stats.py:25-270 — per-name
[count, sum, sum-of-squares] moment triples accumulated on device, synced
across processes, collected to mean/std. TPU-native: moments are a plain
dict of [3] arrays; multi-host sync is a single ``jax.lax.psum`` inside
the jitted step (or ``sync()`` over a mesh outside), replacing the
torch.distributed all_reduce machinery.
"""

from __future__ import annotations

import json
import re
import time

import jax
import jax.numpy as jnp
import numpy as np


def moment(value) -> jnp.ndarray:
    """[count, sum, sum_sq] of an arbitrary tensor (training_stats.py:58)."""
    v = jnp.asarray(value, jnp.float32).reshape(-1)
    return jnp.stack([jnp.asarray(v.size, jnp.float32), v.sum(),
                      jnp.square(v).sum()])


class Collector:
    """Accumulates named moments; regex-filtered reporting
    (training_stats.py Collector)."""

    def __init__(self, regex: str = ".*"):
        self.regex = re.compile(regex)
        self._moments: dict[str, np.ndarray] = {}

    def report(self, name: str, value):
        m = np.asarray(moment(value))
        self._moments[name] = self._moments.get(name, 0) + m

    def update(self, metrics: dict):
        for k, v in metrics.items():
            self.report(k, v)

    def psum_over(self, axis_name: str, moments: dict) -> dict:
        """In-jit collective sync of a moments dict."""
        return {k: jax.lax.psum(v, axis_name) for k, v in moments.items()}

    def mean(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        return float(m[1] / m[0])

    def std(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        mean = m[1] / m[0]
        var = max(m[2] / m[0] - mean ** 2, 0)
        return float(np.sqrt(var))

    def as_dict(self) -> dict:
        return {k: {"mean": self.mean(k), "std": self.std(k),
                    "num": float(v[0])}
                for k, v in self._moments.items()
                if self.regex.fullmatch(k)}

    def reset(self):
        self._moments.clear()


class JsonlLogger:
    """stats.jsonl writer (training_loop.py:336-446 logging tier)."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "a")

    def write(self, record: dict):
        record = {"timestamp": time.time(), **record}
        self._f.write(json.dumps(record) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()
