"""ADA augmentation pipeline (adaptive discriminator augmentation).

Behavioral parity target: training/augment.py:124-441 (AugmentPipe).
Full-fidelity TPU rewrite of every tier:

* pixel blits (xflip, 90-degree rotations, whole-pixel integer
  translation) and general geometry (iso/aniso scale, pre+post rotation
  with the P(pre OR post)=p split, fractional translation), composed
  into one per-sample inverse 3x3 pixel-space homography and executed
  via the reference's wavelet pipeline: reflect-pad, sym6 2x upsample
  (upfirdn2d), one bilinear warp on the doubled grid, sym6 downsample
  with flip_filter (augment.py:264-307);
* color tier as a 4x4 homogeneous matrix (brightness, contrast,
  Householder luma flip, hue rotation, saturation; augment.py:310-375);
* image-space filtering: per-sample amplification of 4 sym2 wavelet
  frequency bands, power-normalized, applied as a separable per-sample
  depthwise FIR (augment.py:379-411);
* corruptions: additive RGB noise and cutout (augment.py:415-437).

Randomness draws mirror the reference's distributions and gating
exactly (e.g. xflip/rotate90/lumaflip draw ``floor(u * k)`` so the
identity element stays in-distribution), with an independent PRNG
subkey per draw. ``debug_percentile`` reproduces the reference's
deterministic debug path, which is what the golden parity test uses
(tests/test_augment.py): every random value is replaced by the same
erfinv/exp2 percentile formulas, so tgi and reference pipelines can be
compared pixel-for-pixel with no RNG coupling.

One deliberate containment: the reference computes a per-batch dynamic
reflect-pad margin from the transformed corners, clamped to
``width - 1`` (augment.py:269-280). XLA needs static shapes, so the
image is always padded to the clamp. The sampling grid never reads
beyond the reference's dynamically computed margin (the margin is
derived *from* the grid's extent), so the results are value-identical;
the cost is a larger intermediate. ``AugmentConfig.pad_max`` caps the
static margin for cheaper training at the price of exactness for
extreme transforms.

The adaptive-p controller (training_loop.py:325-328) lives in
``AdaptiveAugment``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal
from jax.scipy.special import erfinv

from tgi.ops import grid_sample_2d
from tgi.ops.filters import setup_filter
from tgi.ops.upfirdn2d import downsample2d, upsample2d

# Orthogonal wavelet taps (training/augment.py:28-45).
WAVELETS = {
    "haar": [0.7071067811865476, 0.7071067811865476],
    "sym2": [-0.12940952255092145, 0.22414386804185735, 0.836516303737469,
             0.48296291314469025],
    "sym6": [0.015404109327027373, 0.0034907120842174702,
             -0.11799011114819057, -0.048311742585633, 0.4910559419267466,
             0.787641141030194, 0.3379294217276218, -0.07263752278646252,
             -0.021060292512300564, 0.04472490177066578,
             0.0017677118642428036, -0.007800708325034148],
}

# Geometric lowpass (augment.py:174) — separable, DC-normalized.
_HZ_GEOM = setup_filter(WAVELETS["sym6"])
_HZ_PAD = _HZ_GEOM.shape[0] // 4


def _make_fbank():
    """4-band sym2 filter bank for imgfilter (augment.py:176-186)."""
    Hz_lo = np.asarray(WAVELETS["sym2"])
    Hz_hi = Hz_lo * ((-1) ** np.arange(Hz_lo.size))
    Hz_lo2 = np.convolve(Hz_lo, Hz_lo[::-1]) / 2
    Hz_hi2 = np.convolve(Hz_hi, Hz_hi[::-1]) / 2
    Hz_fbank = np.eye(4, 1)
    for i in range(1, Hz_fbank.shape[0]):
        Hz_fbank = np.dstack([Hz_fbank, np.zeros_like(Hz_fbank)]
                             ).reshape(Hz_fbank.shape[0], -1)[:, :-1]
        Hz_fbank = scipy.signal.convolve(Hz_fbank, [Hz_lo2])
        lo = (Hz_fbank.shape[1] - Hz_hi2.size) // 2
        Hz_fbank[i, lo:lo + Hz_hi2.size] += Hz_hi2
    return Hz_fbank.astype(np.float32)


_HZ_FBANK = _make_fbank()


@dataclass(frozen=True)
class AugmentConfig:
    """Probability multipliers + parameters (augment.py:126-172).

    Defaults enable the blit+geom+color tiers (the EG3D 'ada' spec);
    imgfilter/noise/cutout default off as upstream.
    """
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
    imgfilter: float = 0.0
    imgfilter_bands: tuple = (1.0, 1.0, 1.0, 1.0)
    imgfilter_std: float = 1.0
    noise: float = 0.0
    cutout: float = 0.0
    noise_std: float = 0.1
    cutout_size: float = 0.5
    pad_max: int | None = None   # static cap on the geometric pad margin


# -- batched 3x3 / 4x4 matrix helpers (pixel coordinates) ------------------


def _eye(n, d):
    return jnp.tile(jnp.eye(d, dtype=jnp.float32)[None], (n, 1, 1))


def _translate2d(tx, ty):
    n = tx.shape[0]
    m = _eye(n, 3)
    return m.at[:, 0, 2].set(tx).at[:, 1, 2].set(ty)


def _scale2d(sx, sy):
    n = sx.shape[0]
    m = _eye(n, 3)
    return m.at[:, 0, 0].set(sx).at[:, 1, 1].set(sy)


def _rotate2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    n = theta.shape[0]
    m = _eye(n, 3)
    m = m.at[:, 0, 0].set(c).at[:, 0, 1].set(-s)
    m = m.at[:, 1, 0].set(s).at[:, 1, 1].set(c)
    return m


def _translate3d(b):
    n = b.shape[0]
    return _eye(n, 4).at[:, 0, 3].set(b).at[:, 1, 3].set(b).at[:, 2, 3].set(b)


def _scale3d(c):
    n = c.shape[0]
    m = _eye(n, 4)
    return m.at[:, 0, 0].set(c).at[:, 1, 1].set(c).at[:, 2, 2].set(c)


def _rotate3d_about(axis, theta):
    """Rodrigues rotation about ``axis`` embedded in 4x4."""
    n = theta.shape[0]
    x, y, z = axis
    K = jnp.asarray([[0, -z, y], [z, 0, -x], [-y, x, 0]], jnp.float32)
    c = jnp.cos(theta)[:, None, None]
    s = jnp.sin(theta)[:, None, None]
    R3 = (jnp.eye(3)[None] * c + s * K[None]
          + (1 - c) * jnp.outer(axis, axis)[None])
    return _eye(n, 4).at[:, :3, :3].set(R3)


# -- parameter selection ---------------------------------------------------


def _gate(key, prob, value, default, shape):
    """value where uniform < prob else default (reference torch.where
    pattern; prob may be a traced scalar)."""
    u = jax.random.uniform(key, shape)
    return jnp.where(u < prob, value, default)


def _erfinv_q(q):
    return erfinv(jnp.clip(2.0 * q - 1.0, -1 + 1e-7, 1 - 1e-7))


def _geom_inv(key, n, p, cfg: AugmentConfig, W, H, q=None):
    """Per-sample inverse pixel-space homography G_inv (augment.py:
    197-264). ``q``: debug percentile (None = random)."""
    ks = jax.random.split(key, 16)
    G_inv = _eye(n, 3)
    full = lambda v: jnp.full((n,), v, jnp.float32)

    # xflip: i in {0, 1} (augment.py:205-210)
    if cfg.xflip > 0:
        i = jnp.floor(jax.random.uniform(ks[0], (n,)) * 2)
        i = _gate(ks[1], cfg.xflip * p, i, jnp.zeros_like(i), (n,))
        if q is not None:
            i = full(np.floor(q * 2))
        G_inv = G_inv @ _scale2d(1 / (1 - 2 * i), full(1.0))

    # rotate90: i in {0..3} (augment.py:213-218)
    if cfg.rotate90 > 0:
        i = jnp.floor(jax.random.uniform(ks[2], (n,)) * 4)
        i = _gate(ks[3], cfg.rotate90 * p, i, jnp.zeros_like(i), (n,))
        if q is not None:
            i = full(np.floor(q * 4))
        G_inv = G_inv @ _rotate2d(math.pi / 2 * i)   # rotate2d_inv(-pi/2 i)

    # integer translate, rounded to whole pixels (augment.py:221-226)
    if cfg.xint > 0:
        t = (jax.random.uniform(ks[4], (n, 2)) * 2 - 1) * cfg.xint_max
        t = _gate(ks[5], cfg.xint * p, t, jnp.zeros_like(t), (n, 1))
        if q is not None:
            t = jnp.full((n, 2), (q * 2 - 1) * cfg.xint_max, jnp.float32)
        G_inv = G_inv @ _translate2d(-jnp.round(t[:, 0] * W),
                                     -jnp.round(t[:, 1] * H))

    # isotropic scale (augment.py:233-238)
    if cfg.scale > 0:
        s = jnp.exp2(jax.random.normal(ks[6], (n,)) * cfg.scale_std)
        s = _gate(ks[7], cfg.scale * p, s, jnp.ones_like(s), (n,))
        if q is not None:
            s = jnp.exp2(_erfinv_q(full(q)) * cfg.scale_std)
        G_inv = G_inv @ _scale2d(1 / s, 1 / s)

    # pre+post rotation, each with p_rot = 1 - sqrt(1 - rotate*p)
    # so P(pre OR post) = rotate*p (augment.py:241-247, 257-262)
    p_rot = 1 - jnp.sqrt(jnp.clip(1 - cfg.rotate * p, 0, 1))
    if cfg.rotate > 0:
        theta = (jax.random.uniform(ks[8], (n,)) * 2 - 1) \
            * math.pi * cfg.rotate_max
        theta = _gate(ks[9], p_rot, theta, jnp.zeros_like(theta), (n,))
        if q is not None:
            theta = full((q * 2 - 1) * math.pi * cfg.rotate_max)
        G_inv = G_inv @ _rotate2d(theta)             # rotate2d_inv(-theta)

    # anisotropic scale (augment.py:250-255)
    if cfg.aniso > 0:
        s = jnp.exp2(jax.random.normal(ks[10], (n,)) * cfg.aniso_std)
        s = _gate(ks[11], cfg.aniso * p, s, jnp.ones_like(s), (n,))
        if q is not None:
            s = jnp.exp2(_erfinv_q(full(q)) * cfg.aniso_std)
        G_inv = G_inv @ _scale2d(1 / s, s)

    if cfg.rotate > 0:   # post-rotation
        theta = (jax.random.uniform(ks[12], (n,)) * 2 - 1) \
            * math.pi * cfg.rotate_max
        theta = _gate(ks[13], p_rot, theta, jnp.zeros_like(theta), (n,))
        if q is not None:
            theta = jnp.zeros_like(theta)            # augment.py:260
        G_inv = G_inv @ _rotate2d(theta)

    # fractional translate (augment.py:265-270)
    if cfg.xfrac > 0:
        t = jax.random.normal(ks[14], (n, 2)) * cfg.xfrac_std
        t = _gate(ks[15], cfg.xfrac * p, t, jnp.zeros_like(t), (n, 1))
        if q is not None:
            t = jnp.full((n, 2), 1.0, jnp.float32) \
                * _erfinv_q(full(q))[:, None] * cfg.xfrac_std
        G_inv = G_inv @ _translate2d(-t[:, 0] * W, -t[:, 1] * H)
    return G_inv


def _execute_geom(images, G_inv, pad_max=None):
    """Wavelet-filtered warp (augment.py:266-307): reflect-pad, sym6 2x
    upsample, one bilinear sample on the doubled grid, sym6 downsample
    (flip_filter) with crop. Static symmetric padding at the reference's
    clamp (width-1/height-1) — see module docstring."""
    N, C, H, W = images.shape
    mx = W - 1 if pad_max is None else min(pad_max, W - 1)
    my = H - 1 if pad_max is None else min(pad_max, H - 1)
    images = jnp.pad(images, ((0, 0), (0, 0), (my, my), (mx, mx)),
                     mode="reflect")
    # Symmetric pad => the reference's origin shift (mx0-mx1)/2 is zero.
    images = upsample2d(images, _HZ_GEOM, up=2)
    two = jnp.full((N,), 2.0, jnp.float32)
    half = jnp.full((N,), -0.5, jnp.float32)
    G_inv = _scale2d(two, two) @ G_inv @ _scale2d(two / 4, two / 4)
    G_inv = _translate2d(half, half) @ G_inv @ _translate2d(-half, -half)

    out_h = (H + _HZ_PAD * 2) * 2
    out_w = (W + _HZ_PAD * 2) * 2
    in_h, in_w = images.shape[2:]
    sx_in = jnp.full((N,), 2.0 / in_w, jnp.float32)
    sy_in = jnp.full((N,), 2.0 / in_h, jnp.float32)
    sx_out = jnp.full((N,), 2.0 / out_w, jnp.float32)
    sy_out = jnp.full((N,), 2.0 / out_h, jnp.float32)
    G_inv = _scale2d(sx_in, sy_in) @ G_inv @ _scale2d(1 / sx_out, 1 / sy_out)

    # affine_grid(align_corners=False) base grid: pixel centers.
    ys = (2 * jnp.arange(out_h, dtype=jnp.float32) + 1) / out_h - 1
    xs = (2 * jnp.arange(out_w, dtype=jnp.float32) + 1) / out_w - 1
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)      # [h, w, 3]
    coords = jnp.einsum("nij,hwj->nhwi", G_inv[:, :2], grid)    # [n,h,w,2]
    images = grid_sample_2d(images, coords)
    return downsample2d(images, _HZ_GEOM, down=2, padding=-_HZ_PAD * 2,
                        flip_filter=True)


def _color_mat(key, n, p, cfg: AugmentConfig, num_channels, q=None):
    """Homogeneous 4x4 color transform C (augment.py:313-375)."""
    ks = jax.random.split(key, 10)
    C = _eye(n, 4)
    v = jnp.asarray([1, 1, 1, 0], jnp.float32) / math.sqrt(3)
    full = lambda val: jnp.full((n,), val, jnp.float32)

    if cfg.brightness > 0:
        b = jax.random.normal(ks[0], (n,)) * cfg.brightness_std
        b = _gate(ks[1], cfg.brightness * p, b, jnp.zeros_like(b), (n,))
        if q is not None:
            b = _erfinv_q(full(q)) * cfg.brightness_std
        C = _translate3d(b) @ C

    if cfg.contrast > 0:
        c = jnp.exp2(jax.random.normal(ks[2], (n,)) * cfg.contrast_std)
        c = _gate(ks[3], cfg.contrast * p, c, jnp.ones_like(c), (n,))
        if q is not None:
            c = jnp.exp2(_erfinv_q(full(q)) * cfg.contrast_std)
        C = _scale3d(c) @ C

    if cfg.lumaflip > 0:
        i = jnp.floor(jax.random.uniform(ks[4], (n,)) * 2)
        i = _gate(ks[5], cfg.lumaflip * p, i, jnp.zeros_like(i), (n,))
        if q is not None:
            i = full(np.floor(q * 2))
        H = _eye(n, 4) - 2 * jnp.outer(v, v)[None] * i[:, None, None]
        C = H @ C

    if cfg.hue > 0 and num_channels > 1:
        theta = (jax.random.uniform(ks[6], (n,)) * 2 - 1) \
            * math.pi * cfg.hue_max
        theta = _gate(ks[7], cfg.hue * p, theta, jnp.zeros_like(theta),
                      (n,))
        if q is not None:
            theta = full((q * 2 - 1) * math.pi * cfg.hue_max)
        C = _rotate3d_about(v[:3], theta) @ C

    if cfg.saturation > 0 and num_channels > 1:
        s = jnp.exp2(jax.random.normal(ks[8], (n,)) * cfg.saturation_std)
        s = _gate(ks[9], cfg.saturation * p, s, jnp.ones_like(s), (n,))
        if q is not None:
            s = jnp.exp2(_erfinv_q(full(q)) * cfg.saturation_std)
        vv = jnp.outer(v, v)[None]
        C = (vv + (_eye(n, 4) - vv) * s[:, None, None]) @ C
    return C


def _apply_color(images, C):
    """Execute the color matrix per the channel count (augment.py:
    364-375): 3ch direct, 1ch averaged rows, 6ch both halves."""
    n, ch, h, w = images.shape
    flat = images.reshape(n, ch, h * w)
    if ch == 3:
        out = C[:, :3, :3] @ flat + C[:, :3, 3:]
    elif ch == 1:
        Cm = C[:, :3, :].mean(axis=1, keepdims=True)
        out = flat * Cm[:, :, :3].sum(axis=2, keepdims=True) + Cm[:, :, 3:]
    elif ch == 6:
        a = C[:, :3, :3] @ flat[:, :3] + C[:, :3, 3:]
        b = C[:, :3, :3] @ flat[:, 3:] + C[:, :3, 3:]
        out = jnp.concatenate([a, b], axis=1)
    else:
        raise ValueError("images must have 1, 3 or 6 channels")
    return out.reshape(n, ch, h, w)


def _imgfilter(images, key, p, cfg: AugmentConfig, q=None):
    """Per-sample frequency-band amplification (augment.py:379-411)."""
    n, ch, h, w = images.shape
    num_bands = _HZ_FBANK.shape[0]
    assert len(cfg.imgfilter_bands) == num_bands
    expected_power = jnp.asarray(np.array([10, 1, 1, 1]) / 13, jnp.float32)

    g = jnp.ones((n, num_bands), jnp.float32)
    ks = jax.random.split(key, 2 * num_bands)
    for i, band_strength in enumerate(cfg.imgfilter_bands):
        t_i = jnp.exp2(jax.random.normal(ks[2 * i], (n,))
                       * cfg.imgfilter_std)
        t_i = _gate(ks[2 * i + 1], cfg.imgfilter * p * band_strength,
                    t_i, jnp.ones_like(t_i), (n,))
        if q is not None:
            t_i = (jnp.exp2(_erfinv_q(jnp.full((n,), q, jnp.float32))
                            * cfg.imgfilter_std)
                   if band_strength > 0 else jnp.ones((n,), jnp.float32))
        t = jnp.ones((n, num_bands), jnp.float32).at[:, i].set(t_i)
        t = t / jnp.sqrt(jnp.sum(expected_power * t ** 2, axis=-1,
                                 keepdims=True))
        g = g * t

    Hz_prime = g @ jnp.asarray(_HZ_FBANK)            # [n, taps]
    taps = _HZ_FBANK.shape[1]
    pad = taps // 2
    wmat = jnp.repeat(Hz_prime[:, None, :], ch, axis=1)  # [n, ch, taps]
    wmat = wmat.reshape(n * ch, 1, taps)
    x = images.reshape(1, n * ch, h, w)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                mode="reflect")
    x = jax.lax.conv_general_dilated(
        x, wmat[:, :, None, :], window_strides=(1, 1), padding="VALID",
        feature_group_count=n * ch,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(
        x, wmat[:, :, :, None], window_strides=(1, 1), padding="VALID",
        feature_group_count=n * ch,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return x.reshape(n, ch, h, w)


def augment_images(images, key, p, cfg: AugmentConfig = AugmentConfig(),
                   debug_percentile=None):
    """Run the full pipe on ``[N, C, H, W]`` images (C in {1, 3, 6}).

    ``p``: overall probability (scalar, may be traced).
    ``debug_percentile``: python float in [0, 1) — replaces every random
    draw with the reference's deterministic percentile formulas
    (augment.py debug_percentile branches) for golden testing.
    """
    n, ch, h, w = images.shape
    q = debug_percentile
    k_geom, k_color, k_filt, k_noise, k_cut = jax.random.split(key, 5)

    G_inv = _geom_inv(k_geom, n, p, cfg, w, h, q)
    images = _execute_geom(images, G_inv, cfg.pad_max)

    C = _color_mat(k_color, n, p, cfg, ch, q)
    images = _apply_color(images, C)

    if cfg.imgfilter > 0:
        images = _imgfilter(images, k_filt, p, cfg, q)

    # additive RGB noise (augment.py:418-423)
    if cfg.noise > 0:
        k_sig, k_gate, k_field = jax.random.split(k_noise, 3)
        sigma = jnp.abs(jax.random.normal(k_sig, (n, 1, 1, 1))) \
            * cfg.noise_std
        sigma = _gate(k_gate, cfg.noise * p, sigma, jnp.zeros_like(sigma),
                      (n, 1, 1, 1))
        if q is not None:
            import scipy.special
            sigma = jnp.full((n, 1, 1, 1),
                             float(scipy.special.erfinv(q)) * cfg.noise_std,
                             jnp.float32)
        images = images + jax.random.normal(k_field, images.shape) * sigma

    # cutout (augment.py:426-437): gated size (0 disables), center at
    # pixel-center coords (coord + 0.5) / size.
    if cfg.cutout > 0:
        k_gate, k_center = jax.random.split(k_cut)
        size = jnp.full((n, 2, 1, 1), cfg.cutout_size, jnp.float32)
        size = _gate(k_gate, cfg.cutout * p, size, jnp.zeros_like(size),
                     (n, 1, 1, 1))
        center = jax.random.uniform(k_center, (n, 2, 1, 1))
        if q is not None:
            size = jnp.full((n, 2, 1, 1), cfg.cutout_size, jnp.float32)
            center = jnp.full((n, 2, 1, 1), q, jnp.float32)
        cx = jnp.arange(w, dtype=jnp.float32).reshape(1, 1, w)
        cy = jnp.arange(h, dtype=jnp.float32).reshape(1, h, 1)
        mask_x = jnp.abs((cx + 0.5) / w - center[:, 0]) >= size[:, 0] / 2
        mask_y = jnp.abs((cy + 0.5) / h - center[:, 1]) >= size[:, 1] / 2
        mask = (mask_x | mask_y).astype(images.dtype)
        images = images * mask[:, None]
    return images


class AugmentPipe:
    """Callable (img, img_raw, key, p) -> (img, img_raw).

    Mirrors the reference's dual-D augmentation (loss.py:80-86): the raw
    render is antialias-upsampled to the image resolution, the 6-channel
    concat goes through ONE pipe invocation (identical per-sample
    transforms for both halves), then the raw half is antialias-resized
    back down.
    """

    def __init__(self, cfg: AugmentConfig = AugmentConfig()):
        self.cfg = cfg

    def __call__(self, img, img_raw, key, p, debug_percentile=None):
        from tgi.nn.discriminator import filtered_resizing
        raw_res = img_raw.shape[-1]
        raw_up = filtered_resizing(img_raw, img.shape[-1], "antialiased")
        pair = jnp.concatenate([img, raw_up], axis=1)
        pair = augment_images(pair, key, p, self.cfg, debug_percentile)
        img = pair[:, :img.shape[1]]
        img_raw = filtered_resizing(pair[:, img.shape[1]:], raw_res,
                                    "antialiased")
        return img, img_raw


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
