"""Elementary losses and regularizers.

Parity targets: criteria/l2_loss.py:6, base_coach.py:294-305 (depth TV),
w_projector.py:220-239 (multi-scale noise regularization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_loss(a, b):
    return jnp.mean(jnp.square(a - b))


def depth_tv_loss(depth):
    """Total variation on the rendered depth map [N, 1, H, W]
    (base_coach.py:294-305)."""
    dh = jnp.abs(depth[..., 1:, :] - depth[..., :-1, :]).mean()
    dw = jnp.abs(depth[..., :, 1:] - depth[..., :, :-1]).mean()
    return dh + dw


def _noise_reg_single(noise):
    """Multi-scale autocorrelation penalty for one [H, W] noise map
    (w_projector.py:222-239): sum over pyramid levels of squared mean
    correlation with the 1-pixel-shifted map, halving via 2x2 avg pool."""
    x = noise[None, None]
    reg = 0.0
    # Static pyramid: resolutions are known at trace time.
    while True:
        reg = reg + jnp.mean(x * jnp.roll(x, 1, axis=3)) ** 2
        reg = reg + jnp.mean(x * jnp.roll(x, 1, axis=2)) ** 2
        if x.shape[2] <= 8:
            break
        x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 1, 2, 2),
                                  (1, 1, 2, 2),
                                  ((0, 0), (0, 0), (0, 0), (0, 0))) / 4.0
    return reg


def noise_regularization(noise_maps) -> jax.Array:
    """Sum the multi-scale penalty over a list/dict of [H, W] noise maps."""
    if isinstance(noise_maps, dict):
        noise_maps = list(noise_maps.values())
    total = 0.0
    for n in noise_maps:
        total = total + _noise_reg_single(n)
    return total


def normalize_noise(noise_map):
    """Re-project a noise map to zero mean / unit variance
    (w_projector.py:263-270)."""
    n = noise_map - noise_map.mean()
    return n * jax.lax.rsqrt(jnp.mean(jnp.square(n)) + 1e-12)
