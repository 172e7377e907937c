"""ArcFace identity loss.

Behavioral parity target: criteria/id_loss.py:7-30 — crop the face box
[35:223, 32:220], pool to 112², embed with the IR-SE50 backbone, return
1 - cosine similarity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tgi.losses.warp import area_downsample


def extract_face_crop(img):
    """[N, 3, 256, 256] -> ArcFace 112² input (id_loss.py:15-22)."""
    x = img[:, :, 35:223, 32:220]
    n, c, h, w = x.shape
    return jax.image.resize(x, (n, c, 112, 112), method="linear")


def id_loss(embed_fn, y_hat, y):
    """1 - cos(embed(y_hat), embed(y)); images in [-1, 1] at 256²+.

    ``embed_fn``: images -> [N, 512] embeddings (tgi.models.arcface).
    """
    if y.shape[-1] != 256:
        y = area_downsample(y, 256)
    if y_hat.shape[-1] != 256:
        y_hat = area_downsample(y_hat, 256)
    f1 = embed_fn(extract_face_crop(y))
    f2 = embed_fn(extract_face_crop(y_hat))
    f1 = f1 / jnp.linalg.norm(f1, axis=-1, keepdims=True)
    f2 = f2 / jnp.linalg.norm(f2, axis=-1, keepdims=True)
    return 1.0 - jnp.sum(f1 * f2, axis=-1).mean()
