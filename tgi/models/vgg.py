"""VGG16 feature trunk + LPIPS metric head.

Two reference roles (SURVEY.md section 2.6):
  * NVIDIA's metric ``vgg16.pt`` with ``return_lpips=True`` — the
    projection distance (w_projector.py:50-52, 215-218): unit-normalized
    per-layer features scaled by learned LPIPS weights, flattened so that
    the squared L2 between two feature vectors IS the LPIPS distance.
  * torchvision ``vgg16().features`` layer 14 — the warping-loss feature
    map (warping_loss.py:74-109), fed raw [0,255] images.

Param names mirror torchvision's ``features.{idx}`` so pretrained weights
port by rename via :func:`convert_torch_features`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# torchvision vgg16.features conv layout: idx -> (in, out)
VGG16_CONVS = {
    0: (3, 64), 2: (64, 64),
    5: (64, 128), 7: (128, 128),
    10: (128, 256), 12: (256, 256), 14: (256, 256),
    17: (256, 512), 19: (512, 512), 21: (512, 512),
    24: (512, 512), 26: (512, 512), 28: (512, 512),
}
VGG16_POOLS = (4, 9, 16, 23, 30)
# Last ReLU index of each LPIPS stage (relu1_2 ... relu5_3).
LPIPS_STAGES = (3, 8, 15, 22, 29)
LPIPS_CHANNELS = (64, 128, 256, 512, 512)

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def _scaled(c, width_mult):
    return max(1, int(round(c * width_mult)))


def vgg16_init(key, width_mult: float = 1.0):
    """``width_mult < 1`` builds a channel-scaled twin (same 13-conv
    topology; the apply path derives channels from the params) — used
    where full-size aux-net FLOPs dominate a correctness check, e.g. the
    multichip dryrun. Pair with ``lpips_head_init(key, width_mult)``."""
    params = {"features": {}}
    keys = jax.random.split(key, len(VGG16_CONVS))
    for k, (idx, (cin, cout)) in zip(keys, VGG16_CONVS.items()):
        cin = 3 if cin == 3 else _scaled(cin, width_mult)
        cout = _scaled(cout, width_mult)
        std = (2.0 / (cin * 9)) ** 0.5
        params["features"][str(idx)] = {
            "weight": jax.random.normal(k, (cout, cin, 3, 3)) * std,
            "bias": jnp.zeros((cout,)),
        }
    return params


def lpips_head_init(key, width_mult: float = 1.0):
    """Per-stage 1x1 linear weights (lpips 'lin' layers), non-negative."""
    keys = jax.random.split(key, len(LPIPS_CHANNELS))
    return {f"lin{i}": {"weight":
                        jnp.abs(jax.random.normal(
                            k, (_scaled(c, width_mult),)) * 0.1)}
            for i, (k, c) in enumerate(zip(keys, LPIPS_CHANNELS))}


def _conv(x, p):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["bias"].astype(x.dtype)[None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 1, 2, 2), (1, 1, 2, 2),
                                 ((0, 0), (0, 0), (0, 0), (0, 0)))


def vgg16_features(params, x, up_to: int = 15, outputs=()):
    """Run torchvision-indexed features; return activation after layer
    ``up_to - 1`` (i.e. the value entering layer up_to), or a dict of the
    requested ``outputs`` indices (value AFTER that layer index executes).
    """
    grab = set(outputs)
    collected = {}
    maxi = max([up_to - 1] + list(grab))
    for idx in range(maxi + 1):
        if idx in VGG16_CONVS:
            x = _conv(x, params["features"][str(idx)])
        elif idx in VGG16_POOLS:
            x = _maxpool(x)
        else:
            x = jax.nn.relu(x)
        if idx in grab:
            collected[idx] = x
    return collected if outputs else x


def warping_features(params, images):
    """'14' mode of warping_loss.get_features (warping_loss.py:78-115).

    The reference code APPEARS to return the pre-ReLU conv14 output
    (``x15 = layer_list[14](x14)``), but it keeps computing through
    x22, and layer 15 is ``nn.ReLU(inplace=True)`` — ``x16 =
    layer_list[15](x15)`` mutates x15 in place, so the returned tensor
    is in fact the POST-ReLU activation. Parity targets the behavior:
    value after features[15] (verified against the reference function
    directly in tests/test_projector_parity.py)."""
    return vgg16_features(params, images, outputs=(15,))[15]


def lpips_features(params, head_params, images_255):
    """NVIDIA metric-VGG style LPIPS embedding of [0,255] images.

    Returns a flat [N, D] vector such that sum((a-b)**2) between two
    embeddings is the LPIPS distance (w_projector.py:112, 215-218).
    """
    x = images_255 / 255.0
    x = (x - IMAGENET_MEAN[None, :, None, None]) / \
        (IMAGENET_STD[None, :, None, None])
    acts = vgg16_features(params, x, outputs=LPIPS_STAGES)
    feats = []
    N = images_255.shape[0]
    for i, idx in enumerate(LPIPS_STAGES):
        a = acts[idx]
        # channel-wise unit normalization
        a = a * jax.lax.rsqrt(jnp.sum(jnp.square(a), axis=1,
                                      keepdims=True) + 1e-10)
        w = head_params[f"lin{i}"]["weight"]
        a = a * jnp.sqrt(jnp.maximum(w, 0.0))[None, :, None, None]
        hw = a.shape[2] * a.shape[3]
        feats.append((a / jnp.sqrt(hw)).reshape(N, -1))
    return jnp.concatenate(feats, axis=-1)


def lpips_distance(params, head_params, img_a, img_b):
    fa = lpips_features(params, head_params, img_a)
    fb = lpips_features(params, head_params, img_b)
    return jnp.sum(jnp.square(fa - fb), axis=-1)


def convert_torch_features(sd: dict) -> dict:
    """torchvision vgg16 state_dict ('features.0.weight', ...) -> params."""
    import numpy as np
    params = {"features": {}}
    for name, v in sd.items():
        parts = name.split(".")
        if parts[0] != "features":
            continue
        params["features"].setdefault(parts[1], {})[parts[2]] = \
            jnp.asarray(np.asarray(v), jnp.float32)
    return params


def convert_lpips_head(sd: dict) -> dict:
    """lpips-package 'lin{i}.model.1.weight' [C,1,1,1] tensors -> head."""
    import numpy as np
    head = {}
    for i in range(5):
        for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if k in sd:
                head[f"lin{i}"] = {"weight": jnp.asarray(
                    np.asarray(sd[k]).reshape(-1), jnp.float32)}
    return head
