"""Depth-based warping loss — the paper's core pose-optimization signal.

Behavioral parity target: training/warping_loss.py:6-72 +
explainability_network/loss_functions.py:9-19. Pipeline: render the
canonical view from the (detached) latent, back-project the predicted
view's depth to world points, intersect the rays-to-canonical-camera with
the canonical image plane, project to uv, sample canonical VGG features at
the warped coordinates, and take a foreground-masked L1 to the target's
features. Gradients flow to the camera pose (and through depth to w).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tgi.ops import grid_sample_2d
from tgi.render.rays import depth_to_world, ray_sampler


def area_downsample(x, out_size):
    """torch F.interpolate(mode='area') for integer shrink factors."""
    n, c, h, w = x.shape
    f = h // out_size
    assert f * out_size == h
    x = x.reshape(n, c, out_size, f, out_size, f)
    return x.mean(axis=(3, 5))


def bilinear_resize_nchw(x, out_size):
    n, c, _, _ = x.shape
    return jax.image.resize(x, (n, c, out_size, out_size), method="linear")


def line_plane_collision(plane_normal, plane_point, ray_direction, ray_point,
                         epsilon=1e-6):
    """Batched line-plane intersection (warping_loss.py:58-72)."""
    ndotu = jnp.sum(plane_normal * ray_direction, axis=-1, keepdims=True)
    w_vec = ray_point - plane_point
    si = -jnp.sum(plane_normal * w_vec, axis=-1, keepdims=True) / ndotu
    return w_vec + si * ray_direction + plane_point


def calc_warping_loss(canonical_image, vgg_feature_fn, pred_ext, init_ext,
                      intrinsic, depth, target_images):
    """Warping loss between the predicted-pose view and the canonical view.

    Args:
        canonical_image: [1, 3, R, R] canonical render in [-1, 1]
            (rendered by the caller so the generator stays outside;
            the reference renders it inline at warping_loss.py:7).
        vgg_feature_fn: images -> feature map [1, C, Hf, Hf]
            (tgi.models.vgg.warping_features with ported weights).
        pred_ext: [1, 4, 4] predicted camera extrinsics.
        init_ext: [1, 4, 4] canonical extrinsics.
        intrinsic: [1, 3, 3].
        depth: [1, 1, res, res] predicted-view depth map.
        target_images: [1, 3, R', R'] target in [-1, 1] at FULL
            resolution — the reference feeds the raw target tensor
            (w_projector.py:109 target.contiguous(), same [-1, 1] scale
            as the canonical render; its feature grid sets the loss
            resolution, warping_loss.py:49-55).

    Returns:
        (loss, warped_image) — scalar masked-L1 feature loss and the
        canonical image warped to the predicted view (for visualization).
    """
    can_images = canonical_image
    if can_images.shape[2] > 256:
        can_images = area_downsample(can_images, 256)

    # Foreground mask: closer-than-mean depth (warping_loss.py:13-16).
    depth_mean = jnp.mean(depth)
    masked_depths = jnp.where(depth < depth_mean, 1.0, 0.0)

    res = depth.shape[-1]
    ray_origins2, ray_dirs2 = ray_sampler(pred_ext, intrinsic, res)

    # Surface points in world space.
    cam_xyz1 = depth_to_world(ray_origins2, ray_dirs2, depth)   # [4, res²]
    cam_xyz = cam_xyz1[:3].T                                     # [res², 3]
    init_trans = init_ext[:, :3, 3]

    canonical_cam_origin = jnp.tile(init_trans, (cam_xyz.shape[0], 1))
    vectors = cam_xyz - canonical_cam_origin
    plane_norm_vector = -canonical_cam_origin
    plane_point = (init_ext.reshape(4, 4)
                   @ jnp.asarray([0., 0., 1., 1.]))[None, :3]
    plane_point = jnp.tile(plane_point, (cam_xyz.shape[0], 1))

    intersections = line_plane_collision(plane_norm_vector, plane_point,
                                         vectors, canonical_cam_origin)
    ones = jnp.ones((intersections.shape[0], 1), intersections.dtype)
    intersections1 = jnp.concatenate([intersections, ones], axis=-1).T

    target_features = vgg_feature_fn(target_images)
    synth_features = vgg_feature_fn(can_images)

    # World -> canonical camera -> normalized uv (warping_loss.py:39-43).
    w2c = jnp.linalg.inv(init_ext.reshape(4, 4))
    pred_uv = (w2c @ intersections1)[:3].T
    pred_uv = pred_uv / pred_uv[:, 2:]
    pred_uv = (intrinsic.reshape(3, 3) @ pred_uv.T)[:2].T
    pred_uv = (pred_uv - 0.5) * 2

    feat_res = target_features.shape[-1]
    uv_img = pred_uv.reshape(1, res, res, 2)
    uv_resized = bilinear_resize_nchw(
        jnp.transpose(uv_img, (0, 3, 1, 2)), feat_res)
    uv_resized = jnp.transpose(uv_resized, (0, 2, 3, 1))
    warped_feature = grid_sample_2d(synth_features, uv_resized)
    warped_image = grid_sample_2d(can_images, uv_img)
    mask = bilinear_resize_nchw(masked_depths, feat_res)

    # Masked L1 (photometric_reconstruction_loss).
    loss = jnp.abs((warped_feature - target_features) * mask).mean()
    return loss, warped_image
