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
    NamedTuple containers (optax optimizer states) are flattened through
    flax's state-dict form; restore them with ``load_checkpoint(path,
    template=...)``.
    """
    params = serialization.to_state_dict(jax.device_get(params))
    payload = {"params": params}
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


def load_checkpoint(path: str, template=None):
    """Returns {'params': ..., 'config': dict|None, 'metadata': dict|None}.

    Pass ``template`` (a structurally matching pytree, e.g. a fresh
    init_train_state) to restore NamedTuple containers such as optimizer
    states; plain dict trees need no template.
    """
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    config = (json.loads(payload["config_json"])
              if "config_json" in payload else None)
    params = payload["params"]
    if template is not None:
        params = serialization.from_state_dict(template, params)
    return {"params": params, "config": config,
            "metadata": payload.get("metadata")}
