"""CLIP text-image loss.

Behavioral parity target: /root/reference/criteria/clip_loss.py:6-18 —
``avg_pool(upsample(image))`` then ``1 - model(image, text)[0] / 100``:

- ``Upsample(scale_factor=7)`` is torch's default *nearest* mode;
- ``AvgPool2d(kernel_size=stylegan_size // 32)`` with default stride ==
  kernel, so for a 512-px StyleGAN image: 512*7 = 3584 -> /16 = 224;
- the reference divides by the hard-coded 100 (not the checkpoint's
  live ``exp(logit_scale)``) and does NOT apply CLIP's preprocessing
  normalization to the [-1, 1] generator output — both quirks are
  mirrored verbatim.
"""

from __future__ import annotations

import jax.numpy as jnp

from tgi.models.clip import ClipConfig, clip_apply


def clip_pool(image, stylegan_size: int | None = None):
    """nearest-upsample x7 then average-pool to 224 (clip_loss.py:10-14)."""
    n, c, h, w = image.shape
    if stylegan_size is None:
        stylegan_size = h
    k = stylegan_size // 32
    x = jnp.repeat(jnp.repeat(image, 7, axis=2), 7, axis=3)
    hh, ww = x.shape[2] // k, x.shape[3] // k
    return x.reshape(n, c, hh, k, ww, k).mean(axis=(3, 5))


def clip_loss(clip_params, image, token_ids,
              cfg: ClipConfig = ClipConfig(),
              stylegan_size: int | None = None):
    """[N_img, N_txt] CLIP distance, ``1 - logits_per_image/100``."""
    pooled = clip_pool(image, stylegan_size)
    logits_per_image, _ = clip_apply(clip_params, pooled, token_ids, cfg)
    return 1.0 - logits_per_image / 100.0
