"""OSG decoder: tiny MLP turning aggregated tri-plane features into
(sigma, rgb-features).

Behavioral parity target: training/triplane.py:113-136 (OSGDecoder):
mean over planes -> FC(64) -> softplus -> FC(1+32); sigmoid rgb with
MipNeRF margin, raw sigma.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tgi.nn.layers import fully_connected_apply, fully_connected_init


def osg_decoder_init(key, n_features=32, hidden_dim=64, output_dim=32):
    k0, k1 = jax.random.split(key)
    return {
        "net0": fully_connected_init(k0, n_features, hidden_dim),
        "net1": fully_connected_init(k1, hidden_dim, 1 + output_dim),
    }


def osg_decoder_apply(params, sampled_features, lr_multiplier=1.0):
    """sampled_features: [N, 3, M, C] -> {'rgb': [N, M, out], 'sigma': [N, M, 1]}.

    The per-point MLP is evaluated as two batched matmuls over all
    N*M points at once — on TPU this is the MXU-friendly formulation of the
    reference's flattened Sequential (triplane.py:124-133).
    """
    x = sampled_features.mean(axis=1)               # aggregate planes [N,M,C]
    N, M, C = x.shape
    x = x.reshape(N * M, C)
    x = fully_connected_apply(params["net0"], x, lr_multiplier=lr_multiplier)
    x = jax.nn.softplus(x)
    x = fully_connected_apply(params["net1"], x, lr_multiplier=lr_multiplier)
    x = x.reshape(N, M, -1)
    rgb = jax.nn.sigmoid(x[..., 1:]) * (1 + 2 * 0.001) - 0.001
    sigma = x[..., 0:1]
    return {"rgb": rgb, "sigma": sigma}
