"""EG3D super-resolution modules (style-conditioned SR to 128/256/512).

Behavioral parity target: training/superresolution.py:29-291. Each variant
is two SynthesisBlocks conditioned on the last w repeated x3, preceded by a
bilinear resize of the raw render to the block input resolution. Variant
selection mirrors the reference ``rendering_kwargs['superresolution_module']``
class names so converted pickles pick the right architecture.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tgi.nn.synthesis import synthesis_block_apply, synthesis_block_init


@dataclass(frozen=True)
class SRConfig:
    """Static architecture of one SR variant."""
    name: str
    input_resolution: int
    block0: tuple  # (in_ch, out_ch, resolution, up)
    block1: tuple  # (in_ch, out_ch, resolution, up)
    img_resolution: int


SR_VARIANTS = {
    # reference superresolution.py:29-57 (128 -> 512, FFHQ-512)
    "SuperresolutionHybrid8X": SRConfig(
        "SuperresolutionHybrid8X", 128, (32, 128, 256, 2), (128, 64, 512, 2), 512),
    # superresolution.py:264-291 (128 -> 512, FFHQ-rebalanced; wider)
    "SuperresolutionHybrid8XDC": SRConfig(
        "SuperresolutionHybrid8XDC", 128, (32, 256, 256, 2), (256, 128, 512, 2), 512),
    # superresolution.py:62-91 (128 -> 256)
    "SuperresolutionHybrid4X": SRConfig(
        "SuperresolutionHybrid4X", 128, (32, 128, 128, 1), (128, 64, 256, 2), 256),
    # superresolution.py:94-123 (64 -> 128)
    "SuperresolutionHybrid2X": SRConfig(
        "SuperresolutionHybrid2X", 64, (32, 128, 64, 1), (128, 64, 128, 2), 128),
    # superresolution.py:127-152 (128 -> 256, fp32 NoUp variant; structurally
    # 4X — precision is the caller's use_fp16 switch in tgi)
    "SuperresolutionHybridDeepfp32": SRConfig(
        "SuperresolutionHybridDeepfp32", 128,
        (32, 128, 128, 1), (128, 64, 256, 2), 256),
    # Miniature variant for CPU tests and kernel micro-benches (no
    # reference counterpart).
    "SuperresolutionTiny": SRConfig(
        "SuperresolutionTiny", 32, (8, 16, 32, 1), (16, 16, 64, 2), 64),
}


def sr_config_from_class_name(class_name: str) -> SRConfig:
    """Resolve a reference class path like 'training.superresolution.X'."""
    return SR_VARIANTS[class_name.rsplit(".", 1)[-1]]


def superresolution_init(key, cfg: SRConfig, w_dim: int = 512):
    k0, k1 = jax.random.split(key)
    in0, out0, res0, up0 = cfg.block0
    in1, out1, res1, up1 = cfg.block1
    return {
        "block0": synthesis_block_init(k0, in0, out0, w_dim, res0, 3,
                                       is_last=False),
        "block1": synthesis_block_init(k1, in1, out1, w_dim, res1, 3,
                                       is_last=True),
    }


def bilinear_resize(x, size, antialias=False):
    """torch F.interpolate(bilinear, align_corners=False) equivalent.

    jax.image.resize uses half-pixel centers (= align_corners=False) and
    applies anti-aliasing only when downscaling with antialias=True.
    """
    n, c, _, _ = x.shape
    method = "linear"
    return jax.image.resize(x, (n, c, size, size), method=method,
                            antialias=antialias)


def superresolution_apply(params, rgb, x, ws, cfg: SRConfig, *,
                          use_fp16=False, fused_dtype="bfloat16",
                          sr_antialias=True, noise_mode="random",
                          noise_key=None, force_fp32=False, max_res=None):
    """rgb: [N,3,r,r] raw render; x: [N,32,r,r] features; ws: [N,num_ws,512].

    Returns the SR image [N, 3, img_resolution, img_resolution].

    ``max_res``: stop after the first block whose output resolution
    reaches it and return that block's accumulated rgb skip — a reduced-
    cost image for consumers that immediately downsample the full SR
    output anyway (the stage-1 warp loss reads the canonical render only
    as <=256-res VGG features, warping_loss.py:7-10 + w_projector.py:189).
    None (default) runs both blocks — exact reference behavior.
    """
    ws = jnp.tile(ws[:, -1:, :], (1, 3, 1))
    if x.shape[-1] != cfg.input_resolution:
        x = bilinear_resize(x, cfg.input_resolution, antialias=sr_antialias)
        rgb = bilinear_resize(rgb, cfg.input_resolution,
                              antialias=sr_antialias)

    nk = (jax.random.split(noise_key, 2) if noise_key is not None
          else (None, None))
    in0, _, res0, up0 = cfg.block0
    in1, _, res1, up1 = cfg.block1
    if max_res is not None and cfg.input_resolution >= max_res:
        # Level-0 exit: the bilinear-lifted raw render itself.
        return rgb
    x, rgb = synthesis_block_apply(
        params["block0"], x, rgb, ws, in_channels=in0, resolution=res0,
        up=up0, use_fp16=use_fp16, force_fp32=force_fp32,
        conv_clamp=(256 if use_fp16 else None), noise_mode=noise_mode,
        noise_key=nk[0], fused_dtype=fused_dtype)
    if max_res is not None and res0 >= max_res:
        return rgb
    x, rgb = synthesis_block_apply(
        params["block1"], x, rgb, ws, in_channels=in1, resolution=res1,
        up=up1, use_fp16=use_fp16, force_fp32=force_fp32,
        conv_clamp=(256 if use_fp16 else None), noise_mode=noise_mode,
        noise_key=nk[1], fused_dtype=fused_dtype)
    return rgb
