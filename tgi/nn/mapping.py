"""Mapping network z (+c) -> w with truncation and w_avg tracking.

Behavioral parity target: networks_stylegan2.py:192-271 (MappingNetwork).
Functional: the EMA buffer ``w_avg`` is part of the params pytree and the
update is returned, never mutated in place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tgi.nn.layers import (fully_connected_apply, fully_connected_init,
                           normalize_2nd_moment)


def mapping_network_init(key, z_dim, c_dim, w_dim, num_ws, num_layers=8,
                         embed_features=None, layer_features=None):
    if embed_features is None:
        embed_features = w_dim
    if c_dim == 0:
        embed_features = 0
    if layer_features is None:
        layer_features = w_dim
    features = ([z_dim + embed_features] + [layer_features] * (num_layers - 1)
                + [w_dim])
    keys = jax.random.split(key, num_layers + 1)
    params = {}
    if c_dim > 0:
        params["embed"] = fully_connected_init(keys[num_layers], c_dim,
                                               embed_features)
    for i in range(num_layers):
        params[f"fc{i}"] = fully_connected_init(
            keys[i], features[i], features[i + 1], lr_multiplier=0.01)
    params["w_avg"] = jnp.zeros((w_dim,), jnp.float32)
    return params


def mapping_network_apply(params, z, c, *, z_dim, c_dim, num_ws,
                          num_layers=8, truncation_psi=1.0,
                          truncation_cutoff=None):
    """Returns ws of shape [N, num_ws, w_dim] (or [N, w_dim] if num_ws None)."""
    x = None
    if z_dim > 0:
        x = normalize_2nd_moment(z.astype(jnp.float32))
    if c_dim > 0:
        y = normalize_2nd_moment(
            fully_connected_apply(params["embed"], c.astype(jnp.float32)))
        x = jnp.concatenate([x, y], axis=1) if x is not None else y
    for i in range(num_layers):
        x = fully_connected_apply(params[f"fc{i}"], x, activation="lrelu",
                                  lr_multiplier=0.01)
    if num_ws is not None:
        x = jnp.tile(x[:, None, :], (1, num_ws, 1))
    if truncation_psi != 1:
        w_avg = params["w_avg"]
        if num_ws is None or truncation_cutoff is None:
            x = w_avg + truncation_psi * (x - w_avg)
        else:
            trunc = w_avg + truncation_psi * (x[:, :truncation_cutoff] - w_avg)
            x = x.at[:, :truncation_cutoff].set(trunc)
    return x


def update_w_avg(params, ws_detached, beta=0.998):
    """Functional EMA update of w_avg (reference update_emas path)."""
    mean_w = ws_detached.mean(axis=0)
    new = mean_w + (params["w_avg"] - mean_w) * beta
    return {**params, "w_avg": new}
