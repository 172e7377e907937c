"""SSIM / MS-SSIM in JAX.

Replaces the pytorch_msssim dependency used for per-image evaluation
(single_id_coach.py:87-106). Standard Wang et al. formulation: 11-tap
Gaussian window (sigma 1.5), five-scale MS-SSIM with the canonical
weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(size=11, sigma=1.5):
    x = np.arange(size, dtype=np.float32) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _filter2d_sep(x, w):
    # Precision.HIGHEST: on TPU the default fp32 conv runs as bf16
    # passes (~1e-3 drift). The SSIM variance terms are tiny
    # differences of O(1) moments — bf16 drift swamps them and the
    # bounded-by-1 ratios go >1 (observed: ms_ssim 1.09 on-chip).
    # These convs are a negligible metric cost; force exact fp32.
    hi = jax.lax.Precision.HIGHEST
    c = x.shape[1]
    k = len(w)
    kx = jnp.asarray(w, x.dtype).reshape(1, 1, 1, k)
    kx = jnp.tile(kx, (c, 1, 1, 1))
    ky = jnp.transpose(kx, (0, 1, 3, 2))
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), "VALID",
                                     feature_group_count=c,
                                     precision=hi,
                                     dimension_numbers=("NCHW", "OIHW",
                                                        "NCHW"))
    return jax.lax.conv_general_dilated(x, ky, (1, 1), "VALID",
                                        feature_group_count=c,
                                        precision=hi,
                                        dimension_numbers=("NCHW", "OIHW",
                                                           "NCHW"))


def _ssim_components(a, b, data_range=1.0, win_size=11, sigma=1.5):
    w = _gaussian_window(win_size, sigma)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a = _filter2d_sep(a, w)
    mu_b = _filter2d_sep(b, w)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sa = _filter2d_sep(a * a, w) - mu_aa
    sb = _filter2d_sep(b * b, w) - mu_bb
    sab = _filter2d_sep(a * b, w) - mu_ab
    cs = (2 * sab + c2) / (sa + sb + c2)
    ssim_map = ((2 * mu_ab + c1) / (mu_aa + mu_bb + c1)) * cs
    return ssim_map.mean(axis=(1, 2, 3)), cs.mean(axis=(1, 2, 3))


def ssim(a, b, data_range=1.0):
    """Per-item SSIM for [N, C, H, W] images."""
    s, _ = _ssim_components(a, b, data_range)
    return s


def _avg_pool2(x):
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 1, 2, 2),
                                 (1, 1, 2, 2),
                                 ((0, 0), (0, 0), (0, 0), (0, 0))) / 4.0


def ms_ssim(a, b, data_range=1.0, weights=MSSSIM_WEIGHTS):
    """Multi-scale SSIM for [N, C, H, W].

    The canonical 5 scales need H, W >= 176 (11-tap window at scale 16);
    smaller inputs automatically drop the coarsest scales (renormalized
    weights) instead of producing NaN.
    """
    max_levels = 1
    side = min(a.shape[2], a.shape[3])
    while max_levels < len(weights) and side // (2 ** max_levels) >= 11:
        max_levels += 1
    if max_levels < len(weights):
        w = np.asarray(weights[:max_levels])
        weights = tuple(w / w.sum())
    levels = len(weights)
    vals = []
    for i in range(levels):
        s, cs = _ssim_components(a, b, data_range)
        vals.append(s if i == levels - 1 else cs)
        if i < levels - 1:
            a, b = _avg_pool2(a), _avg_pool2(b)
    vals = jnp.stack(vals)                      # [L, N]
    w = jnp.asarray(weights)[:, None]
    return jnp.prod(jnp.maximum(vals, 1e-6) ** w, axis=0)
