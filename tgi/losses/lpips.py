"""LPIPS perceptual distance (VGG and AlexNet backbones).

Wraps the metric embeddings into the two call styles the reference uses:
the NVIDIA feature-vector form for projection (w_projector.py:215-218,
VGG) and a plain image-pair distance for tuning (base_coach.py:48 — the
lpips package with ``net='alex'`` per configs/hyperparameters.py:2, so the
0.06 early-stop threshold keeps its calibration). Weights come from the
structural converters when pretrained checkpoints are provided; random
init keeps the pipeline runnable for smoke tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tgi.models.alexnet import (alex_head_init, alex_lpips_distance,
                                alex_lpips_embed, alexnet_init)
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


class AlexLPIPSLoss:
    """``lpips.LPIPS(net='alex')`` — the reference's stage-2 tuning loss
    (base_coach.py:48 with hyperparameters.lpips_type='alex'). Same call
    surface as :class:`LPIPSLoss`; native input range is [-1, 1]."""

    def __init__(self, alex_params=None, head_params=None, key=None):
        if alex_params is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            k1, k2 = jax.random.split(key)
            alex_params = alexnet_init(k1)
            head_params = alex_head_init(k2)
        self.alex_params = alex_params
        self.head_params = head_params

    def features(self, images_255):
        return alex_lpips_embed(self.alex_params, self.head_params,
                                images_255 / 127.5 - 1.0)

    def __call__(self, img_a_255, img_b_255):
        return self.from_unit(img_a_255 / 127.5 - 1.0,
                              img_b_255 / 127.5 - 1.0)

    def from_unit(self, a, b):
        return alex_lpips_distance(self.alex_params, self.head_params, a, b)


def make_lpips(lpips_type: str, *, vgg_params=None, vgg_head=None,
               alex_params=None, alex_head=None, key=None):
    """Factory mirroring ``LPIPS(net=hyperparameters.lpips_type)``."""
    if lpips_type == "alex":
        return AlexLPIPSLoss(alex_params, alex_head, key=key)
    if lpips_type == "vgg":
        return LPIPSLoss(vgg_params, vgg_head, key=key)
    raise ValueError(f"unknown lpips_type {lpips_type!r}")
