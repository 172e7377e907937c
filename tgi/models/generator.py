"""EG3D tri-plane generator, TPU-native.

Behavioral parity target: training/triplane.py:18-136 (TriPlaneGenerator +
OSGDecoder). The generator is a frozen config object + a params pytree;
``synthesis`` composes ray sampling, the StyleGAN2 backbone, hierarchical
volume rendering and style-conditioned super-resolution into ONE jittable
function — on TPU the whole forward (and its gradient) compiles to a
single XLA program with zero host round-trips, replacing the reference's
per-op CUDA kernel dispatches (SURVEY.md section 3.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any

import jax
import jax.numpy as jnp

from tgi.nn.mapping import mapping_network_apply, mapping_network_init
from tgi.nn.superres import (SRConfig, sr_config_from_class_name,
                             superresolution_apply, superresolution_init)
from tgi.nn.synthesis import (SynthesisConfig, synthesis_network_apply,
                              synthesis_network_init)
from tgi.render.decoder import osg_decoder_apply, osg_decoder_init
from tgi.render.rays import ray_sampler
from tgi.render.renderer import importance_render, run_model


def default_rendering_kwargs(**overrides) -> dict:
    """rendering_kwargs as shipped in the FFHQ-rebalanced pickle; keys kept
    verbatim for checkpoint compatibility (SURVEY.md section 5.6)."""
    kw = dict(
        image_resolution=512,
        disparity_space_sampling=False,
        clamp_mode="softplus",
        superresolution_module=(
            "training.superresolution.SuperresolutionHybrid8XDC"),
        c_gen_conditioning_zero=False,
        c_scale=1.0,
        superresolution_noise_mode="none",
        density_reg=0.25,
        density_reg_p_dist=0.004,
        reg_type="l1",
        decoder_lr_mul=1.0,
        sr_antialias=True,
        depth_resolution=48,
        depth_resolution_importance=48,
        ray_start=2.25,
        ray_end=3.3,
        box_warp=1.0,
        avg_camera_radius=2.7,
        avg_camera_pivot=[0, 0, 0.2],
        white_back=False,
        density_noise=0,
    )
    kw.update(overrides)
    return kw


@dataclass(frozen=True)
class GeneratorConfig:
    z_dim: int = 512
    c_dim: int = 25
    w_dim: int = 512
    img_resolution: int = 512
    img_channels: int = 3
    backbone_resolution: int = 256
    plane_channels: int = 32
    n_planes: int = 3
    sr_num_fp16_res: int = 4
    neural_rendering_resolution: int = 64
    mapping_layers: int = 8
    channel_base: int = 32768
    channel_max: int = 512
    fused_dtype: str = "float32"  # 'bfloat16' for mixed-precision TPU path
    # dtype the tri-planes are sampled in. bf16 halves the bytes the render
    # gather moves (the pipeline's dominant cost on TPU); the decoder MLP
    # still runs fp32. float32 keeps bit-parity with the reference.
    plane_dtype: str = "float32"
    rendering_kwargs: Any = field(default_factory=default_rendering_kwargs)

    @property
    def backbone_cfg(self) -> SynthesisConfig:
        return SynthesisConfig(
            w_dim=self.w_dim, img_resolution=self.backbone_resolution,
            img_channels=self.plane_channels * self.n_planes,
            channel_base=self.channel_base, channel_max=self.channel_max,
            fused_dtype=self.fused_dtype)

    @property
    def sr_cfg(self) -> SRConfig:
        return sr_config_from_class_name(
            self.rendering_kwargs["superresolution_module"])

    @property
    def num_ws(self) -> int:
        return self.backbone_cfg.num_ws

    def with_rendering(self, **overrides) -> "GeneratorConfig":
        kw = dict(self.rendering_kwargs)
        kw.update(overrides)
        return replace(self, rendering_kwargs=kw)


class TriPlaneGenerator:
    """Stateless functional model: all tensors live in the params pytree."""

    def __init__(self, cfg: GeneratorConfig | None = None):
        self.cfg = cfg or GeneratorConfig()

    # -- init ---------------------------------------------------------------

    def init(self, key) -> dict:
        cfg = self.cfg
        k_map, k_bb, k_sr, k_dec = jax.random.split(key, 4)
        return {
            "mapping": mapping_network_init(
                k_map, cfg.z_dim, cfg.c_dim, cfg.w_dim, cfg.num_ws,
                num_layers=cfg.mapping_layers),
            "backbone": synthesis_network_init(k_bb, cfg.backbone_cfg),
            "superresolution": superresolution_init(k_sr, cfg.sr_cfg,
                                                    w_dim=cfg.w_dim),
            "decoder": osg_decoder_init(k_dec, cfg.plane_channels,
                                        output_dim=cfg.plane_channels),
        }

    # -- forward pieces -----------------------------------------------------

    def mapping(self, params, z, c, truncation_psi=1.0,
                truncation_cutoff=None):
        """z [N, z_dim], c [N, 25] -> ws [N, num_ws, w_dim]
        (triplane.py:48-51)."""
        from tgi.utils.shapes import assert_shape
        cfg = self.cfg
        assert_shape(z, (None, cfg.z_dim), "z")
        assert_shape(c, (None, cfg.c_dim), "c (camera conditioning)")
        if cfg.rendering_kwargs.get("c_gen_conditioning_zero", False):
            c = jnp.zeros_like(c)
        c = c * cfg.rendering_kwargs.get("c_scale", 0.0)
        return mapping_network_apply(
            params["mapping"], z, c, z_dim=cfg.z_dim, c_dim=cfg.c_dim,
            num_ws=cfg.num_ws, num_layers=cfg.mapping_layers,
            truncation_psi=truncation_psi,
            truncation_cutoff=truncation_cutoff)

    def backbone_planes(self, params, ws, *, noise_mode="const",
                        noise_key=None, force_fp32=False):
        """ws -> tri-planes [N, 3, 32, 256, 256] (triplane.py:71-76)."""
        cfg = self.cfg
        planes = synthesis_network_apply(
            params["backbone"], ws, cfg.backbone_cfg, noise_mode=noise_mode,
            noise_key=noise_key, force_fp32=force_fp32)
        N = planes.shape[0]
        return planes.reshape(N, cfg.n_planes, cfg.plane_channels,
                              planes.shape[-2], planes.shape[-1])

    def synthesis(self, params, ws, c, *, neural_rendering_resolution=None,
                  noise_mode="const", key=None, det=True, force_fp32=False,
                  planes=None, sr_max_res=None):
        """Full render: ws [N, num_ws, 512], c [N, 25] ->
        {'image', 'image_raw', 'image_depth', 'planes'} (triplane.py:53-90).

        ``planes`` short-circuits the backbone (the reference's
        cache_backbone / use_cached_backbone contract).

        ``sr_max_res`` truncates the SR pyramid at the first block whose
        output reaches it (see superresolution_apply) — a reduced-cost
        'image' for consumers that downsample the full SR output anyway.
        None (default) = exact reference behavior.
        """
        from tgi.utils.shapes import assert_shape
        cfg = self.cfg
        rk = cfg.rendering_kwargs
        res = neural_rendering_resolution or cfg.neural_rendering_resolution
        assert_shape(ws, (None, cfg.num_ws, cfg.w_dim), "ws")
        assert_shape(c, (None, 25), "c (flat cam2world + intrinsics)")
        N = c.shape[0]
        cam2world = c[:, :16].reshape(N, 4, 4)
        intrinsics = c[:, 16:25].reshape(N, 3, 3)

        if key is None:
            k_bb = k_render = k_sr = None
        else:
            k_bb, k_render, k_sr = jax.random.split(key, 3)

        ray_origins, ray_dirs = ray_sampler(cam2world, intrinsics, res)

        if planes is None:
            planes = self.backbone_planes(params, ws, noise_mode=noise_mode,
                                          noise_key=k_bb,
                                          force_fp32=force_fp32)

        feature_samples, depth_samples, _ = importance_render(
            planes.astype(jnp.dtype(cfg.plane_dtype)), params["decoder"],
            ray_origins, ray_dirs, rk, key=k_render, det=det)

        H = W = res
        feature_image = jnp.transpose(feature_samples, (0, 2, 1)).reshape(
            N, feature_samples.shape[-1], H, W)
        depth_image = jnp.transpose(depth_samples, (0, 2, 1)).reshape(
            N, 1, H, W)

        rgb_image = feature_image[:, :3]
        sr_noise_mode = rk.get("superresolution_noise_mode", "none")
        sr_image = superresolution_apply(
            params["superresolution"], rgb_image, feature_image, ws,
            cfg.sr_cfg, use_fp16=(cfg.sr_num_fp16_res > 0
                                  and cfg.fused_dtype != "float32"),
            fused_dtype=cfg.fused_dtype,
            sr_antialias=rk.get("sr_antialias", True),
            noise_mode=sr_noise_mode,
            noise_key=k_sr if sr_noise_mode == "random" else None,
            force_fp32=force_fp32, max_res=sr_max_res)

        return {"image": sr_image, "image_raw": rgb_image,
                "image_depth": depth_image, "planes": planes}

    def sample_mixed(self, params, coordinates, ws, *, noise_mode="const",
                     noise_key=None, planes=None):
        """sigma/rgb at arbitrary 3D points from ws (triplane.py:101-105);
        the shape-extraction path."""
        if planes is None:
            planes = self.backbone_planes(params, ws, noise_mode=noise_mode,
                                          noise_key=noise_key)
        return run_model(planes.astype(jnp.float32), params["decoder"],
                         coordinates, self.cfg.rendering_kwargs)

    def sample(self, params, coordinates, z, c, truncation_psi=1.0,
               **kwargs):
        """sigma/rgb at arbitrary 3D points from z (triplane.py:92-99)."""
        ws = self.mapping(params, z, c, truncation_psi=truncation_psi)
        return self.sample_mixed(params, coordinates, ws, **kwargs)

    def __call__(self, params, z, c, truncation_psi=1.0,
                 truncation_cutoff=None, **synthesis_kwargs):
        ws = self.mapping(params, z, c, truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff)
        return self.synthesis(params, ws, c, **synthesis_kwargs)
