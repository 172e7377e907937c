"""Mip-style volume rendering equation over sample midpoints.

Behavioral parity target: training/volumetric_rendering/ray_marcher.py:20-63
(MipRayMarcher2): midpoint colors/densities, softplus(sigma - 1) density
activation, alpha compositing with cumulative transmittance, nan-safe
clamped composite depth, optional white background, rgb scaled to [-1, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mip_ray_marcher(colors, densities, depths, *, clamp_mode="softplus",
                    white_back=False):
    """colors [N,R,S,C], densities [N,R,S,1], depths [N,R,S,1].

    Returns (composite_rgb [N,R,C], composite_depth [N,R,1],
    weights [N,R,S-1,1]).
    """
    assert clamp_mode == "softplus", "only softplus density supported"
    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    colors_mid = (colors[:, :, :-1] + colors[:, :, 1:]) / 2
    densities_mid = (densities[:, :, :-1] + densities[:, :, 1:]) / 2
    depths_mid = (depths[:, :, :-1] + depths[:, :, 1:]) / 2

    # -1 bias makes the density init well-behaved (ray_marcher.py:33).
    densities_mid = jax.nn.softplus(densities_mid - 1)

    density_delta = densities_mid * deltas
    alpha = 1 - jnp.exp(-density_delta)

    alpha_shifted = jnp.concatenate(
        [jnp.ones_like(alpha[:, :, :1]), 1 - alpha + 1e-10], axis=-2)
    transmittance = jnp.cumprod(alpha_shifted, axis=-2)[:, :, :-1]
    weights = alpha * transmittance

    composite_rgb = jnp.sum(weights * colors_mid, axis=-2)
    weight_total = weights.sum(axis=2)
    composite_depth = jnp.sum(weights * depths_mid, axis=-2) / weight_total
    composite_depth = jnp.nan_to_num(composite_depth, posinf=jnp.inf,
                                     nan=jnp.inf)
    composite_depth = jnp.clip(composite_depth, jnp.min(depths),
                               jnp.max(depths))

    if white_back:
        composite_rgb = composite_rgb + 1 - weight_total

    composite_rgb = composite_rgb * 2 - 1
    return composite_rgb, composite_depth, weights
