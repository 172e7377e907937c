"""Camera rays from cam2world + intrinsics (OpenCV conventions).

Behavioral parity target: training/volumetric_rendering/ray_sampler.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from tgi.render.maths import normalize_vecs


def ray_sampler(cam2world, intrinsics, resolution: int,
                need_cam_space: bool = False):
    """Lift pixel centers to world-space rays.

    Args:
        cam2world: [N, 4, 4].
        intrinsics: [N, 3, 3] normalized (fx, fy, cx, cy in [0, 1] units).
        resolution: image side; M = resolution**2 rays.

    Returns:
        (ray_origins [N, M, 3], ray_dirs [N, M, 3]); with
        ``need_cam_space`` instead (cam_origins_zero, cam_dirs, uv)
        matching ray_sampler.py:24-73.
    """
    N = cam2world.shape[0]
    M = resolution * resolution
    cam_locs_world = cam2world[:, :3, 3]
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    # Pixel-center uv grid in [0,1]; row-major ij meshgrid flipped to (x, y)
    # exactly as the reference builds it (ray_sampler.py:46-48).
    r = jnp.arange(resolution, dtype=jnp.float32)
    ii, jj = jnp.meshgrid(r, r, indexing="ij")
    uv = jnp.stack([jj, ii], axis=0) * (1.0 / resolution) + (0.5 / resolution)
    uv = uv.reshape(2, -1).T[None].repeat(N, axis=0)          # [N, M, 2]

    x_cam = uv[:, :, 0]
    y_cam = uv[:, :, 1]
    z_cam = jnp.ones((N, M), jnp.float32)

    x_lift = (x_cam - cx + cy * sk / fy - sk * y_cam / fy) / fx * z_cam
    y_lift = (y_cam - cy) / fy * z_cam

    cam_rel_points = jnp.stack(
        [x_lift, y_lift, z_cam, jnp.ones_like(z_cam)], axis=-1)  # [N, M, 4]

    world_rel = jnp.einsum("nij,nmj->nmi", cam2world, cam_rel_points)[..., :3]
    ray_dirs = normalize_vecs(world_rel - cam_locs_world[:, None, :])
    ray_origins = jnp.tile(cam_locs_world[:, None, :], (1, M, 1))

    if need_cam_space:
        cam_dirs = normalize_vecs(cam_rel_points[..., :3])
        return jnp.zeros_like(cam_locs_world), cam_dirs, uv
    return ray_origins, ray_dirs


def depth_to_world(ray_origins, ray_dirs, depth):
    """Back-project a depth map to homogeneous world points.

    ray_origins/ray_dirs: [1, res*res, 3]; depth: [1, res, res] (or
    [res, res]). Returns [4, res*res] (ray_sampler.py:75-93).
    """
    res = depth.shape[-1]
    o = ray_origins.reshape(res * res, 3)
    d = ray_dirs.reshape(res * res, 3)
    z = depth.reshape(res * res, 1)
    xyz = o + d * z
    ones = jnp.ones((res * res, 1), xyz.dtype)
    return jnp.concatenate([xyz, ones], axis=-1).T
