"""Native tgi checkpoints (msgpack pytrees via flax.serialization).

Replaces the reference's source-embedding pickles (training_loop.py:396-410)
with plain data checkpoints: the architecture lives in GeneratorConfig, not
in the file. Orbax is used for async/sharded checkpoints in the training
loop; this module is the simple synchronous path.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, params, config=None, metadata: dict | None = None):
    """Write params (+ optional dataclass config and metadata) to ``path``.

    Layout: msgpack bytes of {'params': ..., 'metadata': ...}; config is
    stored as JSON in a sidecar entry so it stays human-readable.
    """
    payload = {"params": jax.device_get(params)}
    if metadata:
        payload["metadata"] = metadata
    if config is not None:
        cfg = (dataclasses.asdict(config)
               if dataclasses.is_dataclass(config) else dict(config))
        payload["config_json"] = json.dumps(cfg)
    data = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """Returns {'params': ..., 'config': dict|None, 'metadata': dict|None}."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    config = (json.loads(payload["config_json"])
              if "config_json" in payload else None)
    return {"params": payload["params"], "config": config,
            "metadata": payload.get("metadata")}
