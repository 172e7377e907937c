"""Ray/box math for the volumetric renderer.

Behavioral parity target: training/volumetric_rendering/math_utils.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_vecs(v, eps=0.0):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def get_ray_limits_box(rays_o, rays_d, box_side_length):
    """Slab-method intersection of rays with the centered cube.

    rays_o, rays_d: [..., 3]. Returns (t_min, t_max) each [..., 1];
    non-intersecting rays get (-1, -2), matching math_utils.py:46-98.
    """
    half = box_side_length / 2
    invdir = 1.0 / rays_d
    # Per-axis entry/exit: pick the near/far box face by ray direction sign.
    t_lo = (-half - rays_o) * invdir
    t_hi = (half - rays_o) * invdir
    t_near = jnp.minimum(t_lo, t_hi)
    t_far = jnp.maximum(t_lo, t_hi)

    tmin_xy = jnp.maximum(t_near[..., 0], t_near[..., 1])
    tmax_xy = jnp.minimum(t_far[..., 0], t_far[..., 1])
    is_valid = ~(t_near[..., 0] > t_far[..., 1]) & ~(t_near[..., 1] > t_far[..., 0])

    tmin = jnp.maximum(tmin_xy, t_near[..., 2])
    tmax = jnp.minimum(tmax_xy, t_far[..., 2])
    is_valid &= ~(tmin_xy > t_far[..., 2]) & ~(t_near[..., 2] > tmax_xy)

    tmin = jnp.where(is_valid, tmin, -1.0)
    tmax = jnp.where(is_valid, tmax, -2.0)
    return tmin[..., None], tmax[..., None]


def linspace_batch(start, stop, num):
    """[num, *start.shape] evenly spaced start..stop inclusive
    (math_utils.py:101-118)."""
    steps = jnp.arange(num, dtype=jnp.float32) / (num - 1)
    steps = steps.reshape((num,) + (1,) * start.ndim)
    return start[None] + steps * (stop - start)[None]
