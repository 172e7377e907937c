"""Two-pass hierarchical volumetric renderer over tri-planes.

Behavioral parity target: renderer.py:137-210 (ImportanceRenderer.forward /
run_model). The whole pipeline — ray-box limits, stratified pass, marcher,
inverse-CDF importance pass, sort-merge, final march — is one jittable
function with static shapes; the only stochastic inputs are explicit PRNG
keys. The ray dimension M = H*W is the shardable axis for multi-chip
rendering (see tgi.parallel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tgi.ops import sample_triplanes
from tgi.parallel.mesh import constrain_ray_axis
from tgi.render.decoder import osg_decoder_apply
from tgi.render.importance import (merged_march, sample_importance,
                                   sample_stratified)
from tgi.render.march import mip_ray_marcher
from tgi.render.maths import get_ray_limits_box


def run_model(planes, decoder_params, sample_coordinates, options,
              density_noise_key=None, point_layout=None):
    """Tri-plane sample + decoder MLP at arbitrary 3D points.

    planes: [N, 3, C, H, W]; sample_coordinates: [N, M, 3].
    point_layout: optional (Ry, Rx, S) structure of the point axis for
    the Pallas splat backward's block ordering.
    Returns {'rgb': [N, M, 32], 'sigma': [N, M, 1]}.
    """
    feats = sample_triplanes(planes, sample_coordinates,
                             box_warp=options["box_warp"],
                             point_layout=point_layout)
    # The gather may run in bf16 (plane_dtype) to halve HBM traffic; the
    # tiny decoder MLP always computes in fp32.
    feats = feats.astype(jnp.float32)
    out = osg_decoder_apply(decoder_params, feats,
                            lr_multiplier=options.get("decoder_lr_mul", 1.0))
    if options.get("density_noise", 0) > 0:
        assert density_noise_key is not None
        out["sigma"] = out["sigma"] + (
            jax.random.normal(density_noise_key, out["sigma"].shape)
            * options["density_noise"])
    return out


def importance_render(planes, decoder_params, ray_origins, ray_directions,
                      options, *, key=None, det=False):
    """Full hierarchical render.

    Args:
        planes: [N, 3, C, H, W] tri-plane features.
        decoder_params: OSG decoder pytree.
        ray_origins / ray_directions: [N, M, 3].
        options: rendering_kwargs dict (box_warp, depth_resolution,
            depth_resolution_importance, ray_start/'auto', clamp_mode ...).
        key: PRNG key for stratified jitter / importance draw / density
            noise; may be None when det=True.
        det: deterministic sampling (no jitter; linspace importance draws).

    Returns:
        (rgb_features [N, M, 32], depth [N, M, 1], weight_sum [N, M, 1]).
    """
    if key is None:
        assert det, "stochastic rendering needs a PRNG key"
        key = jax.random.PRNGKey(0)
    k_strat, k_imp, k_noise = jax.random.split(key, 3)

    # Under tgi.parallel.ray_constrained, pin the ray axis to the mesh's
    # 'rays' axis: GSPMD propagates the sharding through sampling /
    # decoding / marching (no-op otherwise).
    ray_origins = constrain_ray_axis(ray_origins)
    ray_directions = constrain_ray_axis(ray_directions)

    N, M, _ = ray_origins.shape

    if options["ray_start"] == options["ray_end"] == "auto":
        ray_start, ray_end = get_ray_limits_box(
            ray_origins, ray_directions, box_side_length=options["box_warp"])
        is_valid = ray_end > ray_start
        # Replace invalid rays with the min/max of the valid ones — the
        # jit-safe formulation of renderer.py:148-151's boolean indexing.
        big = jnp.float32(1e10)
        valid_min = jnp.min(jnp.where(is_valid, ray_start, big))
        valid_max = jnp.max(jnp.where(is_valid, ray_start, -big))
        ray_start = jnp.where(is_valid, ray_start, valid_min)
        ray_end = jnp.where(is_valid, ray_end, valid_max)
    else:
        ray_start, ray_end = options["ray_start"], options["ray_end"]

    depths_coarse = sample_stratified(
        k_strat, ray_origins, ray_start, ray_end, options["depth_resolution"],
        options.get("disparity_space_sampling", False), det=det)

    S = options["depth_resolution"]
    coords = (ray_origins[:, :, None, :]
              + depths_coarse * ray_directions[:, :, None, :]).reshape(N, -1, 3)

    res = int(round(M ** 0.5))
    layout = (res, res, S) if res * res == M else None
    out = run_model(planes, decoder_params, coords, options,
                    density_noise_key=k_noise, point_layout=layout)
    colors_coarse = out["rgb"].reshape(N, M, S, -1)
    densities_coarse = out["sigma"].reshape(N, M, S, 1)

    N_importance = options["depth_resolution_importance"]
    if N_importance > 0:
        _, _, weights = mip_ray_marcher(
            colors_coarse, densities_coarse, depths_coarse,
            clamp_mode=options["clamp_mode"],
            white_back=options.get("white_back", False))

        depths_fine = sample_importance(k_imp, depths_coarse, weights,
                                        N_importance, det=det)

        coords = (ray_origins[:, :, None, :]
                  + depths_fine * ray_directions[:, :, None, :]).reshape(N, -1, 3)
        layout_f = (res, res, N_importance) if res * res == M else None
        out = run_model(planes, decoder_params, coords, options,
                        density_noise_key=k_noise, point_layout=layout_f)
        colors_fine = out["rgb"].reshape(N, M, N_importance, -1)
        densities_fine = out["sigma"].reshape(N, M, N_importance, 1)

        rgb_final, depth_final, weights = merged_march(
            depths_coarse, colors_coarse, densities_coarse,
            depths_fine, colors_fine, densities_fine,
            clamp_mode=options["clamp_mode"],
            white_back=options.get("white_back", False))
    else:
        rgb_final, depth_final, weights = mip_ray_marcher(
            colors_coarse, densities_coarse, depths_coarse,
            clamp_mode=options["clamp_mode"],
            white_back=options.get("white_back", False))

    return rgb_final, depth_final, weights.sum(axis=2)
