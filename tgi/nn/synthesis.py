"""StyleGAN2 synthesis network (skip architecture) as functional modules.

Behavioral parity targets (networks_stylegan2.py):
  SynthesisLayer    :275-336
  ToRGBLayer        :340-365
  SynthesisBlock    :369-470
  SynthesisNetwork  :474-524

TPU-first choices: bf16 (not fp16) for the high-resolution blocks with the
same conv_clamp=256 guard; noise handled through explicit PRNG threading;
the per-block python loop unrolls at trace time into one fused XLA graph.
Param names mirror the reference state_dict (``b{res}.conv0.weight`` ...)
so the pickle converter is a direct rename.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tgi.ops import bias_act
from tgi.ops.filters import setup_filter
from tgi.ops.upfirdn2d import upsample2d
from tgi.nn.layers import (fully_connected_apply, fully_connected_init,
                           modulated_conv2d)

RESAMPLE_FILTER = setup_filter([1, 3, 3, 1])


def block_resolutions(img_resolution: int) -> list[int]:
    log2 = int(math.log2(img_resolution))
    assert 2 ** log2 == img_resolution and img_resolution >= 4
    return [2 ** i for i in range(2, log2 + 1)]


def channels_for(img_resolution: int, channel_base: int = 32768,
                 channel_max: int = 512) -> dict[int, int]:
    return {res: min(channel_base // res, channel_max)
            for res in block_resolutions(img_resolution)}


def synthesis_num_ws(img_resolution: int) -> int:
    """num_conv per block (+1 torgb on the last block)."""
    num = 0
    for res in block_resolutions(img_resolution):
        num += 1 if res == 4 else 2
    return num + 1


@dataclass(frozen=True)
class SynthesisConfig:
    w_dim: int = 512
    img_resolution: int = 256
    img_channels: int = 96
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: float | None = 256
    fused_dtype: str = "float32"  # 'bfloat16' enables mixed precision

    @property
    def resolutions(self):
        return block_resolutions(self.img_resolution)

    @property
    def channels(self):
        return channels_for(self.img_resolution, self.channel_base,
                            self.channel_max)

    @property
    def fp16_resolution(self):
        return max(2 ** (int(math.log2(self.img_resolution)) + 1
                         - self.num_fp16_res), 8)

    @property
    def num_ws(self):
        return synthesis_num_ws(self.img_resolution)


# ---------------------------------------------------------------------------
# SynthesisLayer


def synthesis_layer_init(key, in_channels, out_channels, w_dim, resolution,
                         kernel_size=3, use_noise=True):
    k_affine, k_weight, k_noise = jax.random.split(key, 3)
    params = {
        "affine": fully_connected_init(k_affine, w_dim, in_channels,
                                       bias_init=1.0),
        "weight": jax.random.normal(
            k_weight, (out_channels, in_channels, kernel_size, kernel_size),
            jnp.float32),
        "bias": jnp.zeros((out_channels,), jnp.float32),
    }
    if use_noise:
        params["noise_const"] = jax.random.normal(
            k_noise, (resolution, resolution), jnp.float32)
        params["noise_strength"] = jnp.zeros((), jnp.float32)
    return params


def synthesis_layer_apply(params, x, w, *, resolution, up=1, use_noise=True,
                          activation="lrelu", conv_clamp=None,
                          noise_mode="const", noise_key=None, gain=1.0,
                          pre_normalize=False):
    styles = fully_connected_apply(params["affine"], w)

    noise = None
    if use_noise and noise_mode == "random":
        assert noise_key is not None, "noise_mode='random' needs a PRNG key"
        noise = (jax.random.normal(noise_key,
                                   (x.shape[0], 1, resolution, resolution),
                                   jnp.float32)
                 * params["noise_strength"])
    elif use_noise and noise_mode == "const":
        noise = params["noise_const"] * params["noise_strength"]

    flip_weight = (up == 1)
    x = modulated_conv2d(x, params["weight"], styles, noise=noise, up=up,
                         padding=params["weight"].shape[-1] // 2,
                         resample_filter=RESAMPLE_FILTER if up > 1 else None,
                         flip_weight=flip_weight, pre_normalize=pre_normalize)

    act_gain = bias_act_gain(activation) * gain
    act_clamp = conv_clamp * gain if conv_clamp is not None else None
    return bias_act(x, params["bias"].astype(x.dtype), act=activation,
                    gain=act_gain, clamp=act_clamp)


def bias_act_gain(activation):
    from tgi.ops.bias_act import activation_funcs
    return activation_funcs[activation].def_gain


# ---------------------------------------------------------------------------
# ToRGBLayer


def torgb_layer_init(key, in_channels, out_channels, w_dim, kernel_size=1):
    k_affine, k_weight = jax.random.split(key)
    return {
        "affine": fully_connected_init(k_affine, w_dim, in_channels,
                                       bias_init=1.0),
        "weight": jax.random.normal(
            k_weight, (out_channels, in_channels, kernel_size, kernel_size),
            jnp.float32),
        "bias": jnp.zeros((out_channels,), jnp.float32),
    }


def torgb_layer_apply(params, x, w, *, conv_clamp=None, pre_normalize=False):
    out_c, in_c, kh, kw = params["weight"].shape
    weight_gain = 1 / math.sqrt(in_c * kh * kw)
    styles = fully_connected_apply(params["affine"], w) * weight_gain
    x = modulated_conv2d(x, params["weight"], styles, demodulate=False)
    return bias_act(x, params["bias"].astype(x.dtype), clamp=conv_clamp)


# ---------------------------------------------------------------------------
# SynthesisBlock


def synthesis_block_init(key, in_channels, out_channels, w_dim, resolution,
                         img_channels, is_last, use_noise=True, up=2):
    """up=1 gives the SR 'NoUp' variant (superresolution.py:158-257)."""
    keys = jax.random.split(key, 4)
    params = {}
    if in_channels == 0:
        params["const"] = jax.random.normal(
            keys[0], (out_channels, resolution, resolution), jnp.float32)
    else:
        params["conv0"] = synthesis_layer_init(
            keys[1], in_channels, out_channels, w_dim,
            resolution, use_noise=use_noise)
    params["conv1"] = synthesis_layer_init(keys[2], out_channels,
                                           out_channels, w_dim, resolution,
                                           use_noise=use_noise)
    # Skip architecture: every block carries a torgb (accumulated output).
    params["torgb"] = torgb_layer_init(keys[3], out_channels, img_channels,
                                       w_dim)
    return params


def synthesis_block_apply(params, x, img, ws, *, in_channels, resolution,
                          use_fp16=False, force_fp32=False, conv_clamp=256,
                          use_noise=True, noise_mode="const", noise_key=None,
                          up=2, fused_dtype="bfloat16"):
    """ws: [N, num_conv + 1, w_dim]. Returns (x, img)."""
    dtype = (jnp.dtype(fused_dtype) if use_fp16 and not force_fp32
             else jnp.float32)
    pre_normalize = dtype != jnp.float32
    w_idx = 0
    nk = (jax.random.split(noise_key, 2) if noise_key is not None
          else (None, None))

    if in_channels == 0:
        x = jnp.tile(params["const"].astype(dtype)[None],
                     (ws.shape[0], 1, 1, 1))
    else:
        x = x.astype(dtype)

    if in_channels != 0:
        x = synthesis_layer_apply(
            params["conv0"], x, ws[:, w_idx], resolution=resolution, up=up,
            use_noise=use_noise, conv_clamp=conv_clamp, noise_mode=noise_mode,
            noise_key=nk[0], pre_normalize=pre_normalize)
        w_idx += 1
    x = synthesis_layer_apply(
        params["conv1"], x, ws[:, w_idx], resolution=resolution,
        use_noise=use_noise, conv_clamp=conv_clamp, noise_mode=noise_mode,
        noise_key=nk[1], pre_normalize=pre_normalize)
    w_idx += 1

    if img is not None:
        img = upsample2d(img, RESAMPLE_FILTER) if up > 1 else img
    if "torgb" in params:
        y = torgb_layer_apply(params["torgb"], x, ws[:, w_idx],
                              conv_clamp=conv_clamp)
        y = y.astype(jnp.float32)
        img = img + y if img is not None else y
    return x, img


# ---------------------------------------------------------------------------
# SynthesisNetwork


def synthesis_network_init(key, cfg: SynthesisConfig):
    params = {}
    channels = cfg.channels
    keys = jax.random.split(key, len(cfg.resolutions))
    for k, res in zip(keys, cfg.resolutions):
        in_ch = channels[res // 2] if res > 4 else 0
        params[f"b{res}"] = synthesis_block_init(
            k, in_ch, channels[res], cfg.w_dim, res, cfg.img_channels,
            is_last=(res == cfg.img_resolution))
    return params


def synthesis_network_apply(params, ws, cfg: SynthesisConfig, *,
                            noise_mode="const", noise_key=None,
                            force_fp32=False):
    """ws: [N, num_ws, w_dim] -> img [N, img_channels, R, R] (float32)."""
    channels = cfg.channels
    ws = ws.astype(jnp.float32)
    n_blocks = len(cfg.resolutions)
    block_keys = (jax.random.split(noise_key, n_blocks)
                  if noise_key is not None else [None] * n_blocks)

    x = img = None
    w_idx = 0
    for bk, res in zip(block_keys, cfg.resolutions):
        in_ch = channels[res // 2] if res > 4 else 0
        num_conv = 1 if res == 4 else 2
        cur_ws = jax.lax.slice_in_dim(ws, w_idx, w_idx + num_conv + 1, axis=1)
        x, img = synthesis_block_apply(
            params[f"b{res}"], x, img, cur_ws, in_channels=in_ch,
            resolution=res, use_fp16=(res >= cfg.fp16_resolution
                                      and cfg.fused_dtype != "float32"),
            force_fp32=force_fp32, conv_clamp=cfg.conv_clamp,
            noise_mode=noise_mode, noise_key=bk,
            fused_dtype=cfg.fused_dtype)
        w_idx += num_conv
    return img
