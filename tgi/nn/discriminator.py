"""StyleGAN2 discriminator + EG3D dual discriminator.

Behavioral parity targets:
  DiscriminatorBlock / MinibatchStdLayer / DiscriminatorEpilogue /
  Discriminator   networks_stylegan2.py:556-795
  DualDiscriminator (6-channel image+raw input, filtered raw upsample)
                  training/dual_discriminator.py:21-249
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tgi.nn.layers import conv2d_layer_apply, conv2d_layer_init, \
    fully_connected_apply, fully_connected_init
from tgi.nn.mapping import mapping_network_apply, mapping_network_init
from tgi.nn.synthesis import RESAMPLE_FILTER
from tgi.ops.upfirdn2d import downsample2d, upsample2d


@dataclass(frozen=True)
class DiscriminatorConfig:
    c_dim: int = 25
    img_resolution: int = 512
    img_channels: int = 6           # dual discrimination: rgb + raw-rgb
    channel_base: int = 32768
    channel_max: int = 512
    mbstd_group_size: int = 4
    mbstd_num_channels: int = 1
    conv_clamp: float | None = 256
    disc_c_noise: float = 0.0
    mapping_layers: int = 8

    @property
    def block_resolutions(self):
        log2 = int(math.log2(self.img_resolution))
        return [2 ** i for i in range(log2, 2, -1)]

    @property
    def channels(self):
        return {res: min(self.channel_base // res, self.channel_max)
                for res in self.block_resolutions + [4]}

    @property
    def cmap_dim(self):
        return 0 if self.c_dim == 0 else self.channels[4]


def discriminator_block_init(key, in_channels, tmp_channels, out_channels,
                             img_channels, first_block):
    keys = jax.random.split(key, 4)
    params = {}
    if first_block:
        params["fromrgb"] = conv2d_layer_init(keys[0], img_channels,
                                              tmp_channels, 1)
    params["conv0"] = conv2d_layer_init(keys[1], tmp_channels, tmp_channels, 3)
    params["conv1"] = conv2d_layer_init(keys[2], tmp_channels, out_channels, 3)
    params["skip"] = conv2d_layer_init(keys[3], tmp_channels, out_channels, 1,
                                       bias=False)
    return params


def discriminator_block_apply(params, x, img, *, conv_clamp=256):
    if "fromrgb" in params:
        y = conv2d_layer_apply(params["fromrgb"], img, activation="lrelu",
                               conv_clamp=conv_clamp)
        x = x + y if x is not None else y
    y = conv2d_layer_apply(params["skip"], x, down=2,
                           gain=math.sqrt(0.5))
    x = conv2d_layer_apply(params["conv0"], x, activation="lrelu",
                           conv_clamp=conv_clamp)
    x = conv2d_layer_apply(params["conv1"], x, activation="lrelu", down=2,
                           conv_clamp=conv_clamp, gain=math.sqrt(0.5))
    return y + x, img


def minibatch_std(x, group_size=4, num_channels=1):
    """networks_stylegan2.py:645-671."""
    N, C, H, W = x.shape
    G = min(group_size, N) if group_size is not None else N
    F = num_channels
    c = C // F
    y = x.reshape(G, -1, F, c, H, W)
    y = y - y.mean(axis=0)
    y = jnp.sqrt(jnp.mean(jnp.square(y), axis=0) + 1e-8)
    y = y.mean(axis=(2, 3, 4))
    y = y.reshape(-1, F, 1, 1)
    y = jnp.tile(y, (G, 1, H, W))
    return jnp.concatenate([x, y], axis=1)


def discriminator_init(key, cfg: DiscriminatorConfig):
    ch = cfg.channels
    keys = jax.random.split(key, len(cfg.block_resolutions) + 4)
    params = {}
    for k, res in zip(keys, cfg.block_resolutions):
        in_ch = ch[res] if res < cfg.img_resolution else 0
        params[f"b{res}"] = discriminator_block_init(
            k, in_ch, ch[res], ch[res // 2], cfg.img_channels,
            first_block=(res == cfg.img_resolution))
    if cfg.c_dim > 0:
        params["mapping"] = mapping_network_init(
            keys[-4], 0, cfg.c_dim, cfg.cmap_dim, None,
            num_layers=cfg.mapping_layers)
        del params["mapping"]["w_avg"]
    params["b4"] = {
        "conv": conv2d_layer_init(keys[-3],
                                  ch[4] + cfg.mbstd_num_channels, ch[4], 3),
        "fc": fully_connected_init(keys[-2], ch[4] * 16, ch[4]),
        "out": fully_connected_init(keys[-1], ch[4],
                                    1 if cfg.cmap_dim == 0 else cfg.cmap_dim),
    }
    return params


def discriminator_apply(params, img, c, cfg: DiscriminatorConfig, *,
                        c_noise_key=None):
    x = None
    for res in cfg.block_resolutions:
        x, img = discriminator_block_apply(params[f"b{res}"], x, img,
                                           conv_clamp=cfg.conv_clamp)
    cmap = None
    if cfg.c_dim > 0:
        if cfg.disc_c_noise > 0 and c_noise_key is not None:
            c = c + (jax.random.normal(c_noise_key, c.shape)
                     * c.std(axis=0) * cfg.disc_c_noise)
        cmap = mapping_network_apply(params["mapping"], None, c, z_dim=0,
                                     c_dim=cfg.c_dim, num_ws=None,
                                     num_layers=cfg.mapping_layers)
    ep = params["b4"]
    x = minibatch_std(x, cfg.mbstd_group_size, cfg.mbstd_num_channels)
    x = conv2d_layer_apply(ep["conv"], x, activation="lrelu",
                           conv_clamp=cfg.conv_clamp)
    x = fully_connected_apply(ep["fc"], x.reshape(x.shape[0], -1),
                              activation="lrelu")
    x = fully_connected_apply(ep["out"], x)
    if cfg.cmap_dim > 0:
        x = jnp.sum(x * cmap, axis=1, keepdims=True) \
            * (1 / math.sqrt(cfg.cmap_dim))
    return x


def filtered_resizing(img, size, filter_mode="antialiased"):
    """dual_discriminator.py:86-103: resize the raw render to the final
    resolution before channel-concat. Four modes: 'antialiased' (default),
    'classic' (FIR up ×2 → bilinear → FIR down ×2), 'none' (plain
    bilinear), or a float in (0,1) blending aliased/antialiased."""
    n, c, h, w = img.shape
    if filter_mode == "antialiased":
        return jax.image.resize(img, (n, c, size, size), method="linear",
                                antialias=True)
    if filter_mode == "classic":
        f = RESAMPLE_FILTER
        x = upsample2d(img, f, up=2)
        x = jax.image.resize(x, (n, c, size * 2 + 2, size * 2 + 2),
                             method="linear")
        return downsample2d(x, f, down=2, flip_filter=True, padding=-1)
    if filter_mode == "none":
        return jax.image.resize(img, (n, c, size, size), method="linear")
    if isinstance(filter_mode, float):
        assert 0 < filter_mode < 1
        filtered = jax.image.resize(img, (n, c, size, size), method="linear",
                                    antialias=True)
        aliased = jax.image.resize(img, (n, c, size, size), method="linear")
        return (1 - filter_mode) * aliased + filter_mode * filtered
    raise ValueError(f"unknown filter_mode: {filter_mode!r}")


def dual_discriminator_apply(params, img, img_raw, c,
                             cfg: DiscriminatorConfig,
                             filter_mode="antialiased", **kw):
    """DualDiscriminator.forward (dual_discriminator.py:156-173)."""
    raw_up = filtered_resizing(img_raw, img.shape[-1], filter_mode)
    x = jnp.concatenate([img, raw_up], axis=1)
    return discriminator_apply(params, x, c, cfg, **kw)
