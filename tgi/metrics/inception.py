"""Inception-V3 feature extractor for FID/KID/PR/IS.

The reference downloads NVIDIA's pickled Inception detector at runtime
(metrics/metric_utils.py:44-57) — unavailable in a zero-egress
environment. This is the torchvision Inception-V3 architecture (BN
variant, aux head off) producing the standard 2048-d pool3 embedding;
pretrained torchvision weights port via :func:`convert_torch_inception`.
Numbers are comparable across runs using the same detector weights (the
universal caveat for any FID).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tgi.models.irse import bn_init, conv_init


def _bn(p, x, eps=1e-3):
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    shift = p["bias"] - p["running_mean"] * scale
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def _conv(x, w, stride=1, padding=(0, 0)):
    if isinstance(padding, int):
        padding = (padding, padding)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride),
        ((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _basic_conv_init(key, in_c, out_c, k, pad=0):
    kh, kw = (k, k) if isinstance(k, int) else k
    return {"conv": {"weight": conv_init(key, out_c, in_c, 1)
                     if kh == kw == 1 else
                     jax.random.normal(key, (out_c, in_c, kh, kw)) * 0.02},
            "bn": bn_init(out_c), "_pad": pad, "_stride": 1}


def _basic_conv(p, x, stride=1, padding=0):
    x = _conv(x, p["conv"]["weight"], stride=stride, padding=padding)
    return jax.nn.relu(_bn(p["bn"], x))


def _maxpool(x, k=3, s=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s),
        ((0, 0), (0, 0), (pad, pad), (pad, pad)))


def _avgpool(x, k=3, s=1, pad=1):
    ones = jax.lax.reduce_window(
        jnp.ones_like(x), 0., jax.lax.add, (1, 1, k, k), (1, 1, s, s),
        ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    summed = jax.lax.reduce_window(
        x, 0., jax.lax.add, (1, 1, k, k), (1, 1, s, s),
        ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    return summed / ones


def inception_v3_init(key):
    """Random-init parameter tree with torchvision's module names."""
    import numpy as np
    keys = iter(jax.random.split(key, 256))

    def bc(in_c, out_c, k):
        kh, kw = (k, k) if isinstance(k, int) else k
        return {"conv": {"weight":
                         jax.random.normal(next(keys),
                                           (out_c, in_c, kh, kw)) * 0.02},
                "bn": bn_init(out_c)}

    p = {
        "Conv2d_1a_3x3": bc(3, 32, 3), "Conv2d_2a_3x3": bc(32, 32, 3),
        "Conv2d_2b_3x3": bc(32, 64, 3), "Conv2d_3b_1x1": bc(64, 80, 1),
        "Conv2d_4a_3x3": bc(80, 192, 3),
    }

    def mixed_a(name, in_c, pool_c):
        p[name] = {
            "branch1x1": bc(in_c, 64, 1),
            "branch5x5_1": bc(in_c, 48, 1), "branch5x5_2": bc(48, 64, 5),
            "branch3x3dbl_1": bc(in_c, 64, 1),
            "branch3x3dbl_2": bc(64, 96, 3),
            "branch3x3dbl_3": bc(96, 96, 3),
            "branch_pool": bc(in_c, pool_c, 1),
        }

    mixed_a("Mixed_5b", 192, 32)
    mixed_a("Mixed_5c", 256, 64)
    mixed_a("Mixed_5d", 288, 64)
    p["Mixed_6a"] = {
        "branch3x3": bc(288, 384, 3),
        "branch3x3dbl_1": bc(288, 64, 1), "branch3x3dbl_2": bc(64, 96, 3),
        "branch3x3dbl_3": bc(96, 96, 3),
    }

    def mixed_c(name, c7):
        p[name] = {
            "branch1x1": bc(768, 192, 1),
            "branch7x7_1": bc(768, c7, 1),
            "branch7x7_2": bc(c7, c7, (1, 7)),
            "branch7x7_3": bc(c7, 192, (7, 1)),
            "branch7x7dbl_1": bc(768, c7, 1),
            "branch7x7dbl_2": bc(c7, c7, (7, 1)),
            "branch7x7dbl_3": bc(c7, c7, (1, 7)),
            "branch7x7dbl_4": bc(c7, c7, (7, 1)),
            "branch7x7dbl_5": bc(c7, 192, (1, 7)),
            "branch_pool": bc(768, 192, 1),
        }

    mixed_c("Mixed_6b", 128)
    mixed_c("Mixed_6c", 160)
    mixed_c("Mixed_6d", 160)
    mixed_c("Mixed_6e", 192)
    p["Mixed_7a"] = {
        "branch3x3_1": bc(768, 192, 1), "branch3x3_2": bc(192, 320, 3),
        "branch7x7x3_1": bc(768, 192, 1),
        "branch7x7x3_2": bc(192, 192, (1, 7)),
        "branch7x7x3_3": bc(192, 192, (7, 1)),
        "branch7x7x3_4": bc(192, 192, 3),
    }

    def mixed_e(name, in_c):
        p[name] = {
            "branch1x1": bc(in_c, 320, 1),
            "branch3x3_1": bc(in_c, 384, 1),
            "branch3x3_2a": bc(384, 384, (1, 3)),
            "branch3x3_2b": bc(384, 384, (3, 1)),
            "branch3x3dbl_1": bc(in_c, 448, 1),
            "branch3x3dbl_2": bc(448, 384, 3),
            "branch3x3dbl_3a": bc(384, 384, (1, 3)),
            "branch3x3dbl_3b": bc(384, 384, (3, 1)),
            "branch_pool": bc(in_c, 192, 1),
        }

    mixed_e("Mixed_7b", 1280)
    mixed_e("Mixed_7c", 2048)
    return p


def inception_v3_features(params, x):
    """x: [N, 3, 299, 299] in [-1, 1] -> [N, 2048] pool3 features."""
    def B(name, x, stride=1, padding=0):
        return _basic_conv(params_stack[name], x, stride, padding)

    params_stack = params
    x = B("Conv2d_1a_3x3", x, 2)
    x = B("Conv2d_2a_3x3", x)
    x = B("Conv2d_2b_3x3", x, padding=1)
    x = _maxpool(x)
    x = B("Conv2d_3b_1x1", x)
    x = B("Conv2d_4a_3x3", x)
    x = _maxpool(x)

    def sub(block, name, x, stride=1, padding=0):
        return _basic_conv(params[block][name], x, stride, padding)

    for blk in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        b1 = sub(blk, "branch1x1", x)
        b5 = sub(blk, "branch5x5_2", sub(blk, "branch5x5_1", x), padding=2)
        b3 = sub(blk, "branch3x3dbl_3",
                 sub(blk, "branch3x3dbl_2",
                     sub(blk, "branch3x3dbl_1", x), padding=1), padding=1)
        bp = sub(blk, "branch_pool", _avgpool(x))
        x = jnp.concatenate([b1, b5, b3, bp], axis=1)

    blk = "Mixed_6a"
    b3 = sub(blk, "branch3x3", x, stride=2)
    bd = sub(blk, "branch3x3dbl_3",
             sub(blk, "branch3x3dbl_2",
                 sub(blk, "branch3x3dbl_1", x), padding=1), stride=2)
    x = jnp.concatenate([b3, bd, _maxpool(x)], axis=1)

    for blk in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        b1 = sub(blk, "branch1x1", x)
        b7 = sub(blk, "branch7x7_3",
                 sub(blk, "branch7x7_2",
                     sub(blk, "branch7x7_1", x), padding=(0, 3)),
                 padding=(3, 0))
        bd = x
        for i, pad in (("1", 0), ("2", (3, 0)), ("3", (0, 3)),
                       ("4", (3, 0)), ("5", (0, 3))):
            bd = sub(blk, f"branch7x7dbl_{i}", bd, padding=pad)
        bp = sub(blk, "branch_pool", _avgpool(x))
        x = jnp.concatenate([b1, b7, bd, bp], axis=1)

    blk = "Mixed_7a"
    b3 = sub(blk, "branch3x3_2", sub(blk, "branch3x3_1", x), stride=2)
    b7 = sub(blk, "branch7x7x3_1", x)
    b7 = sub(blk, "branch7x7x3_2", b7, padding=(0, 3))
    b7 = sub(blk, "branch7x7x3_3", b7, padding=(3, 0))
    b7 = sub(blk, "branch7x7x3_4", b7, stride=2)
    x = jnp.concatenate([b3, b7, _maxpool(x)], axis=1)

    for blk in ("Mixed_7b", "Mixed_7c"):
        b1 = sub(blk, "branch1x1", x)
        b3 = sub(blk, "branch3x3_1", x)
        b3 = jnp.concatenate(
            [sub(blk, "branch3x3_2a", b3, padding=(0, 1)),
             sub(blk, "branch3x3_2b", b3, padding=(1, 0))], axis=1)
        bd = sub(blk, "branch3x3dbl_2",
                 sub(blk, "branch3x3dbl_1", x), padding=1)
        bd = jnp.concatenate(
            [sub(blk, "branch3x3dbl_3a", bd, padding=(0, 1)),
             sub(blk, "branch3x3dbl_3b", bd, padding=(1, 0))], axis=1)
        bp = sub(blk, "branch_pool", _avgpool(x))
        x = jnp.concatenate([b1, b3, bd, bp], axis=1)

    return x.mean(axis=(2, 3))            # [N, 2048]


def inception_feature_fn(params, resize=True):
    """Returns fn(img_unit [-1,1] NCHW) -> [N, 2048]."""
    def fn(img):
        n, c, h, w = img.shape
        if resize and h != 299:
            img = jax.image.resize(img, (n, c, 299, 299), method="linear")
        return inception_v3_features(params, img)
    return fn


def inception_logits(params, x):
    """[N, 3, 299, 299] -> [N, 1000] class logits (needs the 'fc' entry
    from convert_torch_inception; used by the Inception Score)."""
    feats = inception_v3_features(params, x)
    fc = params["fc"]
    return feats @ fc["weight"].T + fc["bias"]


def convert_torch_inception(sd: dict) -> dict:
    """torchvision inception_v3 state_dict -> params tree (fc kept for
    the Inception Score; aux head dropped)."""
    import numpy as np
    out: dict = {}
    for name, v in sd.items():
        if "num_batches_tracked" in name or name.startswith("AuxLogits"):
            continue
        parts = name.split(".")
        node = out
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(np.asarray(v), jnp.float32)
    return out
