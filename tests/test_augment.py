"""ADA AugmentPipe golden parity vs the reference (training/augment.py).

The reference's ``debug_percentile`` path replaces every random draw
with deterministic percentile formulas — tgi implements the same hook,
so the two pipelines compare pixel-for-pixel with no RNG coupling.
The additive-noise tier is excluded from the combined golden (its field
is drawn from the framework RNG; only sigma is deterministic) and is
checked statistically instead.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tgi.train.augment import AugmentConfig, augment_images

REF = "/root/reference"

ALL_ON = dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
              xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
              saturation=1, imgfilter=1, cutout=1)


def _ref_pipe(**spec):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from training.augment import AugmentPipe as RefPipe
    return RefPipe(**spec)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.parametrize("q", [0.05, 0.35, 0.65, 0.95])
def test_augment_golden_full_pipeline(rng, q):
    """All tiers at p=1 (blit + geom + color + imgfilter + cutout),
    deterministic percentile q, vs reference AugmentPipe."""
    import torch
    img = rng.randn(2, 3, 32, 32).astype(np.float32)
    ref = _ref_pipe(**ALL_ON)
    cfg = AugmentConfig(imgfilter=1.0, cutout=1.0)
    with torch.no_grad():
        want = ref(torch.as_tensor(img), debug_percentile=q).numpy()
    got = np.asarray(augment_images(jnp.asarray(img), jax.random.PRNGKey(1),
                                    1.0, cfg, debug_percentile=q))
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.parametrize("channels", [1, 6])
def test_augment_golden_channel_layouts(rng, channels):
    """The 1-channel (averaged color rows) and 6-channel (dual-D concat)
    execution branches (augment.py:364-375)."""
    import torch
    img = rng.randn(2, channels, 32, 32).astype(np.float32)
    ref = _ref_pipe(**ALL_ON)
    cfg = AugmentConfig(imgfilter=1.0, cutout=1.0)
    with torch.no_grad():
        want = ref(torch.as_tensor(img), debug_percentile=0.7).numpy()
    got = np.asarray(augment_images(jnp.asarray(img), jax.random.PRNGKey(1),
                                    1.0, cfg, debug_percentile=0.7))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_xint_translates_whole_pixels(rng):
    """Integer translation rounds to whole pixels (augment.py:221-226)
    and actually fires — regression for the round-2 no-op bug where
    round(t*0.5)*2 was identically zero."""
    from tgi.train.augment import _geom_inv
    cfg = AugmentConfig(xflip=0, rotate90=0, scale=0, rotate=0, aniso=0,
                        xfrac=0)
    W = H = 64
    G_inv = np.asarray(_geom_inv(jax.random.PRNGKey(3), 256, 1.0, cfg, W, H))
    tx, ty = G_inv[:, 0, 2], G_inv[:, 1, 2]
    # whole pixels only
    np.testing.assert_array_equal(tx, np.round(tx))
    np.testing.assert_array_equal(ty, np.round(ty))
    # xint_max=0.125 at 64px: |t| <= 8, and a healthy fraction nonzero
    assert np.abs(tx).max() <= 8 and np.abs(ty).max() <= 8
    assert (np.abs(tx) + np.abs(ty) > 0).mean() > 0.5


def test_gating_distributions():
    """Reference draw semantics: xflip draws floor(u*2) so only ~half of
    gate-passing samples actually flip (augment.py:205-210); rotate is
    split into pre+post each at p_rot = 1-sqrt(1-p)."""
    from tgi.train.augment import _geom_inv
    cfg = AugmentConfig(rotate90=0, xint=0, scale=0, rotate=0, aniso=0,
                        xfrac=0)
    n = 4000
    G_inv = np.asarray(_geom_inv(jax.random.PRNGKey(5), n, 1.0, cfg, 64, 64))
    flipped = (G_inv[:, 0, 0] < 0).mean()
    assert 0.42 < flipped < 0.58        # ~0.5, not ~1.0

    cfg_rot = AugmentConfig(xflip=0, rotate90=0, xint=0, scale=0, aniso=0,
                            xfrac=0)
    G_inv = np.asarray(_geom_inv(jax.random.PRNGKey(6), n, 0.5, cfg_rot,
                                 64, 64))
    # P(any rotation) = p = 0.5 at rotate=1; identity otherwise.
    rotated = (np.abs(G_inv[:, 0, 1]) > 1e-7).mean()
    assert 0.42 < rotated < 0.58


def test_noise_tier_statistics(rng):
    """Noise can't golden-match (framework RNG field); check sigma
    scaling statistically: output variance grows by E[sigma^2]."""
    cfg = AugmentConfig(xflip=0, rotate90=0, xint=0, scale=0, rotate=0,
                        aniso=0, xfrac=0, brightness=0, contrast=0,
                        lumaflip=0, hue=0, saturation=0, noise=1.0,
                        noise_std=0.5)
    img = jnp.zeros((64, 3, 32, 32))
    out = np.asarray(augment_images(img, jax.random.PRNGKey(8), 1.0, cfg))
    # sigma = |N(0,1)|*0.5 per sample; E[var] = E[sigma^2] = 0.25
    assert 0.15 < out.var() < 0.35
    # with q: sigma = erfinv(q)*std exactly
    out_q = np.asarray(augment_images(img, jax.random.PRNGKey(8), 1.0, cfg,
                                      debug_percentile=0.9))
    import scipy.special
    sig = scipy.special.erfinv(0.9) * 0.5
    per_sample_std = out_q.reshape(64, -1).std(axis=1)
    np.testing.assert_allclose(per_sample_std, sig, rtol=0.1)
