"""LPIPS perceptual distance (VGG backbone).

Wraps tgi.models.vgg's metric embedding into the two call styles the
reference uses: the NVIDIA feature-vector form for projection
(w_projector.py:215-218) and a plain image-pair distance for tuning
(base_coach.py:48, lpips package). Weights come from
``convert_torch_features`` / ``convert_lpips_head`` when pretrained VGG /
lpips checkpoints are provided; random init keeps the pipeline runnable
for smoke tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tgi.models.vgg import (lpips_distance, lpips_features, lpips_head_init,
                            vgg16_init)


class LPIPSLoss:
    """Bundled VGG+head params with convenient call forms."""

    def __init__(self, vgg_params=None, head_params=None, key=None):
        if vgg_params is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            k1, k2 = jax.random.split(key)
            vgg_params = vgg16_init(k1)
            head_params = lpips_head_init(k2)
        self.vgg_params = vgg_params
        self.head_params = head_params

    def features(self, images_255):
        return lpips_features(self.vgg_params, self.head_params, images_255)

    def __call__(self, img_a_255, img_b_255):
        return lpips_distance(self.vgg_params, self.head_params,
                              img_a_255, img_b_255)

    def from_unit(self, a, b):
        """Distance for images in [-1, 1] (the tuning-stage call form)."""
        return self((a + 1) * 127.5, (b + 1) * 127.5)
