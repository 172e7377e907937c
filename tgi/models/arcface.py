"""ArcFace IR-SE50 backbone for the identity loss.

Behavioral parity target: models/facial_recognition/model_irse.py:9-50
(Backbone(input_size=112, num_layers=50, mode='ir_se')): trunk -> BN ->
flatten -> linear(512*7*7 -> 512) -> BN1d -> l2-normalize. Dropout is
inference-off.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tgi.models.irse import batchnorm, bn_init, trunk_apply, trunk_init


def arcface_init(key, num_layers=50):
    k_trunk, k_fc = jax.random.split(key)
    params = trunk_init(k_trunk, num_layers=num_layers, se=True)
    params["output_layer"] = {
        "0": bn_init(512),
        "3": {"weight": jax.random.normal(k_fc, (512, 512 * 7 * 7)) * 0.01,
              "bias": jnp.zeros((512,))},
        "4": {"weight": jnp.ones((512,)), "bias": jnp.zeros((512,)),
              "running_mean": jnp.zeros((512,)),
              "running_var": jnp.ones((512,))},
    }
    return params


def arcface_apply(params, x, num_layers=50):
    """x: [N, 3, 112, 112] -> l2-normalized [N, 512] embeddings."""
    x = trunk_apply(params, x, num_layers=num_layers, se=True)
    ol = params["output_layer"]
    x = batchnorm(ol["0"], x)
    x = x.reshape(x.shape[0], -1)
    x = x @ ol["3"]["weight"].T + ol["3"]["bias"]
    bn = ol["4"]
    x = ((x - bn["running_mean"]) * jax.lax.rsqrt(bn["running_var"] + 1e-5)
         * bn["weight"] + bn["bias"])
    return x / jnp.linalg.norm(x, axis=1, keepdims=True)


def convert_torch_state_dict(sd: dict) -> dict:
    """Port a torch Backbone state_dict by structural rename."""
    import numpy as np
    out: dict = {}
    for name, v in sd.items():
        if "num_batches_tracked" in name:
            continue
        parts = name.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(v), jnp.float32)
    return out
