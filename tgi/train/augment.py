"""ADA augmentation pipeline (adaptive discriminator augmentation).

Behavioral parity target: training/augment.py:124-441 (AugmentPipe). The
reference composes per-sample 3x3 geometric homographies executed via
grid_sample and 4x4 color-space homogeneous transforms. This TPU-native
version keeps that structure — one fused geometric warp + one fused color
matmul per batch, everything vmapped/jitted with explicit PRNG — covering
pixel blits (xflip, 90° rotations, integer translation), general
geometric (iso/aniso scale, rotation, fractional translation), color
(brightness, contrast, luma flip, hue rotation, saturation), additive
noise and cutout. The reference's wavelet-filtered resampling and
frequency-band imgfilter stages are intentionally simplified to bilinear
warps — quality-neutral for dual-D training and far cheaper on the VPU.

The adaptive-p controller (training_loop.py:325-328) lives in
``AdaptiveAugment``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tgi.ops import grid_sample_2d


@dataclass(frozen=True)
class AugmentConfig:
    xflip: float = 1.0
    rotate90: float = 1.0
    xint: float = 1.0
    xint_max: float = 0.125
    scale: float = 1.0
    rotate: float = 1.0
    aniso: float = 1.0
    xfrac: float = 1.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    brightness: float = 1.0
    contrast: float = 1.0
    lumaflip: float = 1.0
    hue: float = 1.0
    saturation: float = 1.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    noise: float = 0.0
    cutout: float = 0.0
    noise_std: float = 0.1
    cutout_size: float = 0.5


def _rand_apply(key, p, prob, shape=()):
    return jax.random.uniform(key, shape) < p * prob


def _geom_matrices(key, n, p, cfg: AugmentConfig):
    """Per-sample inverse 3x3 homographies in normalized [-1,1] coords.

    Every apply-gate and every value draw uses an independent subkey —
    correlating them would bias the augmentation distribution (the
    reference draws each from a fresh torch.rand, augment.py:177-260)."""
    ks = jax.random.split(key, 13)
    eye = jnp.tile(jnp.eye(3)[None], (n, 1, 1))
    G = eye

    # xflip
    apply = _rand_apply(ks[0], p, cfg.xflip, (n,))
    flip = eye.at[:, 0, 0].set(jnp.where(apply, -1.0, 1.0))
    G = flip @ G

    # rotate90: k in {0..3}
    apply = _rand_apply(ks[1], p, cfg.rotate90, (n,))
    k90 = jnp.where(apply, jax.random.randint(ks[2], (n,), 0, 4), 0)
    theta = k90.astype(jnp.float32) * (math.pi / 2)
    G = _rot2d(theta) @ G

    # integer translate (fraction of image size)
    apply = _rand_apply(ks[3], p, cfg.xint, (n, 1))
    t = jax.random.uniform(ks[4], (n, 2), minval=-cfg.xint_max,
                           maxval=cfg.xint_max) * 2
    t = jnp.where(apply, jnp.round(t * 0.5) * 2, 0.0)
    G = _translate2d(t) @ G

    # isotropic scale (log-normal)
    apply = _rand_apply(ks[5], p, cfg.scale, (n, 1))
    s = jnp.exp2(jax.random.normal(ks[6], (n, 1)) * cfg.scale_std)
    s = jnp.where(apply, s, 1.0)
    G = _scale2d(s, s) @ G

    # rotation
    apply = _rand_apply(ks[7], p, cfg.rotate, (n,))
    theta = jnp.where(apply, jax.random.uniform(
        ks[8], (n,), minval=-math.pi, maxval=math.pi) * cfg.rotate_max, 0.0)
    G = _rot2d(theta) @ G

    # anisotropic scale
    apply = _rand_apply(ks[9], p, cfg.aniso, (n, 1))
    a = jnp.exp2(jax.random.normal(ks[10], (n, 1)) * cfg.aniso_std)
    a = jnp.where(apply, a, 1.0)
    G = _scale2d(a, 1 / a) @ G

    # fractional translate
    apply = _rand_apply(ks[11], p, cfg.xfrac, (n, 1))
    t = jax.random.normal(ks[12], (n, 2)) * cfg.xfrac_std * 2
    t = jnp.where(apply, t, 0.0)
    G = _translate2d(t) @ G
    return G


def _rot2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    n = theta.shape[0]
    m = jnp.tile(jnp.eye(3)[None], (n, 1, 1))
    m = m.at[:, 0, 0].set(c).at[:, 0, 1].set(-s)
    m = m.at[:, 1, 0].set(s).at[:, 1, 1].set(c)
    return m


def _scale2d(sx, sy):
    n = sx.shape[0]
    m = jnp.tile(jnp.eye(3)[None], (n, 1, 1))
    return m.at[:, 0, 0].set(sx[:, 0]).at[:, 1, 1].set(sy[:, 0])


def _translate2d(t):
    n = t.shape[0]
    m = jnp.tile(jnp.eye(3)[None], (n, 1, 1))
    return m.at[:, 0, 2].set(t[:, 0]).at[:, 1, 2].set(t[:, 1])


def _color_matrices(key, n, p, cfg: AugmentConfig):
    """Per-sample 4x4 homogeneous color transforms (augment.py color tier).
    Gates and value draws use independent subkeys (see _geom_matrices)."""
    ks = jax.random.split(key, 9)
    eye = jnp.tile(jnp.eye(4)[None], (n, 1, 1))
    C = eye
    v_luma = jnp.asarray([1, 1, 1, 0], jnp.float32) / math.sqrt(3)

    apply = _rand_apply(ks[0], p, cfg.brightness, (n,))
    b = jax.random.normal(ks[1], (n,)) * cfg.brightness_std
    T = eye.at[:, :3, 3].add(jnp.where(apply, b, 0.0)[:, None])
    C = T @ C

    apply = _rand_apply(ks[2], p, cfg.contrast, (n,))
    c = jnp.exp2(jax.random.normal(ks[3], (n,)) * cfg.contrast_std)
    c = jnp.where(apply, c, 1.0)
    T = eye.at[:, 0, 0].set(c).at[:, 1, 1].set(c).at[:, 2, 2].set(c)
    C = T @ C

    # luma flip: householder about the luma axis with prob p
    apply = _rand_apply(ks[4], p, cfg.lumaflip, (n, 1, 1))
    H = eye - 2 * jnp.outer(v_luma, v_luma)[None]
    C = jnp.where(apply, H @ C, C)

    # hue rotation about the luma axis
    apply = _rand_apply(ks[5], p, cfg.hue, (n,))
    theta = jnp.where(apply, jax.random.uniform(
        ks[6], (n,), minval=-math.pi, maxval=math.pi) * cfg.hue_max, 0.0)
    C = _rot3d_about(v_luma[:3], theta) @ C

    # saturation
    apply = _rand_apply(ks[7], p, cfg.saturation, (n, 1, 1))
    s = jnp.exp2(jax.random.normal(ks[8], (n, 1, 1)) * cfg.saturation_std)
    s = jnp.where(apply, s, 1.0)
    outer = jnp.outer(v_luma, v_luma)[None]
    T = outer + (eye - outer) * s
    C = T @ C
    return C


def _rot3d_about(axis, theta):
    """Rodrigues rotation embedded in 4x4."""
    n = theta.shape[0]
    x, y, z = axis
    K = jnp.asarray([[0, -z, y], [z, 0, -x], [-y, x, 0]], jnp.float32)
    c = jnp.cos(theta)[:, None, None]
    s = jnp.sin(theta)[:, None, None]
    R3 = (jnp.eye(3)[None] * c + s * K[None]
          + (1 - c) * jnp.outer(axis, axis)[None])
    m = jnp.tile(jnp.eye(4)[None], (n, 1, 1))
    return m.at[:, :3, :3].set(R3)


class AugmentPipe:
    """Callable (img, img_raw, key, p) -> (img, img_raw).

    Applies the SAME per-sample transform to the 512² image and the raw
    render (the reference concatenates them channel-wise before augmenting,
    loss.py:79-84 — identical effect).
    """

    def __init__(self, cfg: AugmentConfig = AugmentConfig()):
        self.cfg = cfg

    def __call__(self, img, img_raw, key, p):
        cfg = self.cfg
        n = img.shape[0]
        k_geom, k_color, k_noise, k_cut = jax.random.split(key, 4)

        G = _geom_matrices(k_geom, n, p, cfg)
        img = self._warp(img, G)
        img_raw = self._warp(img_raw, G)

        C = _color_matrices(k_color, n, p, cfg)
        img = self._color(img, C)
        img_raw = self._color(img_raw, C)

        if cfg.noise > 0:
            k_sig, k_gate, k_field = jax.random.split(k_noise, 3)
            sigma = jnp.abs(jax.random.normal(k_sig, (n, 1, 1, 1))) \
                * cfg.noise_std
            apply = _rand_apply(k_gate, p, cfg.noise, (n, 1, 1, 1))
            img = img + jnp.where(apply, sigma, 0.0) * \
                jax.random.normal(k_field, img.shape)
        if cfg.cutout > 0:
            img = self._cutout(img, k_cut, p)
        return img, img_raw

    def _warp(self, img, G):
        n, c, h, w = img.shape
        ys = jnp.linspace(-1 + 1 / h, 1 - 1 / h, h)
        xs = jnp.linspace(-1 + 1 / w, 1 - 1 / w, w)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # [h, w, 3]
        warped = jnp.einsum("nij,hwj->nhwi", G, grid)
        coords = warped[..., :2] / warped[..., 2:3]
        return grid_sample_2d(img, coords)

    def _color(self, img, C):
        n, c, h, w = img.shape
        flat = img.reshape(n, c, -1)
        out = jnp.einsum("nij,njp->nip", C[:, :3, :3], flat) \
            + C[:, :3, 3:4]
        return out.reshape(n, c, h, w)

    def _cutout(self, img, key, p):
        cfg = self.cfg
        n, c, h, w = img.shape
        k1, k2, k3 = jax.random.split(key, 3)
        apply = _rand_apply(k1, p, cfg.cutout, (n, 1, 1, 1))
        cx = jax.random.uniform(k2, (n, 1, 1, 1))
        cy = jax.random.uniform(k3, (n, 1, 1, 1))
        xs = jnp.linspace(0, 1, w)[None, None, None, :]
        ys = jnp.linspace(0, 1, h)[None, None, :, None]
        mask = ((jnp.abs(xs - cx) >= cfg.cutout_size / 2)
                | (jnp.abs(ys - cy) >= cfg.cutout_size / 2))
        return jnp.where(apply, img * mask, img)


class AdaptiveAugment:
    """ADA p-controller (training_loop.py:325-328): drive
    E[sign(D_real)] toward ``target`` by nudging p."""

    def __init__(self, target=0.6, interval=4, kimg=500, batch_size=4):
        self.target = target
        self.interval = interval
        self.adjust = batch_size * interval / (kimg * 1000)
        self.p = 0.0

    def update(self, real_logits_sign_mean: float):
        # training_loop.py:325-328: p += sign(E[sign(D_real)] - target)
        # * batch*interval/(kimg*1000), floored at 0 (no upper clamp).
        direction = float(np.sign(real_logits_sign_mean - self.target))
        self.p = max(self.p + direction * self.adjust, 0.0)
        return self.p
