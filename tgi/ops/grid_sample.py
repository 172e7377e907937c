"""Bilinear grid sampling — the tri-plane render hot spot.

TPU-native replacement for ``torch.nn.functional.grid_sample`` (bilinear,
``align_corners=False``, zeros padding) as used by the reference tri-plane
sampler (training/volumetric_rendering/renderer.py:55-66). JAX has no
native grid_sample; this formulates it as four row-gathers from an
``[HW, C]``-transposed feature map plus a lerp — a layout where the gather
runs along the sublane axis and the channel axis stays vectorized, which
XLA maps well onto TPU. A fused Pallas kernel lives in
``tgi.ops.pallas.triplane_kernel`` for the production path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord, size):
    """align_corners=False: map [-1, 1] to pixel centers [-0.5, size-0.5]."""
    return (coord + 1.0) * (size / 2.0) - 0.5


def _gather_corner(img_flat, ix, iy, H, W):
    """Gather [N, P, C] values at integer (ix, iy), zero outside bounds.

    img_flat: [N, H*W, C]; ix, iy: [N, P] int32.
    """
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    idx = iyc * W + ixc
    vals = jnp.take_along_axis(img_flat, idx[..., None], axis=1)
    return vals * valid[..., None].astype(img_flat.dtype)


def grid_sample_2d(img: jax.Array, grid: jax.Array) -> jax.Array:
    """Bilinear sample ``img`` at ``grid`` locations.

    Args:
        img: ``[N, C, H, W]`` feature maps.
        grid: ``[N, Hg, Wg, 2]`` normalized coords in [-1, 1]; channel 0 is
            x (width), channel 1 is y (height).

    Returns:
        ``[N, C, Hg, Wg]``, matching torch grid_sample(align_corners=False,
        padding_mode='zeros', mode='bilinear').
    """
    N, C, H, W = img.shape
    _, Hg, Wg, _ = grid.shape
    P = Hg * Wg
    g = grid.reshape(N, P, 2).astype(jnp.float32)

    ix = _unnormalize(g[..., 0], W)
    iy = _unnormalize(g[..., 1], H)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = (ix - x0).astype(img.dtype)[..., None]
    wy = (iy - y0).astype(img.dtype)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    img_flat = jnp.transpose(img.reshape(N, C, H * W), (0, 2, 1))  # [N, HW, C]
    v00 = _gather_corner(img_flat, x0, y0, H, W)
    v01 = _gather_corner(img_flat, x0 + 1, y0, H, W)
    v10 = _gather_corner(img_flat, x0, y0 + 1, H, W)
    v11 = _gather_corner(img_flat, x0 + 1, y0 + 1, H, W)

    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    out = top + (bot - top) * wy                                   # [N, P, C]
    return jnp.transpose(out, (0, 2, 1)).reshape(N, C, Hg, Wg)


def grid_sample_points(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Point-list variant: img [N, C, H, W], coords [N, P, 2] -> [N, P, C].

    Avoids the fake Hg/Wg reshape round-trip of the image variant — this is
    the layout the volumetric renderer actually needs (channels-last point
    features feeding the decoder MLP).
    """
    N, C, H, W = img.shape
    g = coords.astype(jnp.float32)
    ix = _unnormalize(g[..., 0], W)
    iy = _unnormalize(g[..., 1], H)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = (ix - x0).astype(img.dtype)[..., None]
    wy = (iy - y0).astype(img.dtype)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    img_flat = jnp.transpose(img.reshape(N, C, H * W), (0, 2, 1))
    v00 = _gather_corner(img_flat, x0, y0, H, W)
    v01 = _gather_corner(img_flat, x0 + 1, y0, H, W)
    v10 = _gather_corner(img_flat, x0, y0 + 1, H, W)
    v11 = _gather_corner(img_flat, x0 + 1, y0 + 1, H, W)

    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    return top + (bot - top) * wy


def project_onto_planes(coords: jax.Array) -> jax.Array:
    """Project world points onto the three EG3D tri-plane axes.

    coords: [N, M, 3] -> [N, 3, M, 2]. Axis convention matches the
    reference ``generate_planes``/``project_onto_planes``
    (renderer.py:23-53), including its (z, x) third plane: the projections
    are (x, y), (x, z), (z, x).
    """
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    p0 = jnp.stack([x, y], axis=-1)
    p1 = jnp.stack([x, z], axis=-1)
    p2 = jnp.stack([z, x], axis=-1)
    return jnp.stack([p0, p1, p2], axis=1)


def sample_triplanes(planes: jax.Array, coords: jax.Array,
                     box_warp: float) -> jax.Array:
    """Sample tri-plane features at 3D points.

    Args:
        planes: ``[N, 3, C, H, W]`` tri-plane features.
        coords: ``[N, M, 3]`` world coordinates.
        box_warp: side length of the [-box/2, box/2] volume.

    Returns:
        ``[N, 3, M, C]`` per-plane bilinear features (zeros outside the
        box), matching reference ``sample_from_planes``.
    """
    N, n_planes, C, H, W = planes.shape
    M = coords.shape[1]
    coords = (2.0 / box_warp) * coords
    proj = project_onto_planes(coords)                     # [N, 3, M, 2]
    planes_flat = planes.reshape(N * n_planes, C, H, W)
    proj_flat = proj.reshape(N * n_planes, M, 2)
    feats = grid_sample_points(planes_flat, proj_flat)     # [N*3, M, C]
    return feats.reshape(N, n_planes, M, C)
