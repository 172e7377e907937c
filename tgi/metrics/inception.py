"""Inception-V3 feature extractor for FID/KID/PR/IS.

The reference downloads NVIDIA's pickled Inception-2015-12-05 detector
at runtime (metrics/metric_utils.py:44-57; the TF classify_image graph
ported to torch). Two weight sources convert into the same param tree:

  * :func:`convert_torch_inception` — torchvision ``inception_v3``
    state_dicts (same block layout, 1000-class head);
  * :func:`convert_nvidia_inception` — NVIDIA's detector pickle
    (loaded code-free via ``tgi.io.pickle_import``), whose modules keep
    the TF graph names (``layers.mixed_4.tower.conv``, ...) and whose
    head is the original 1008-class softmax. With these weights, FID/
    KID/IS values are directly comparable to upstream-published numbers.

Behavioral notes for TF-2015 fidelity (the pytorch-fid patch list):
average pools here already normalize by the true window size
(count_include_pad=False, the TF semantics), and ``tf_layout=True``
switches Mixed_7c's pool branch to MAX pooling — a quirk of the
2015-12-05 graph that torchvision's re-implementation dropped.
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
    if "bias" in p["conv"]:        # BN-folded weights (NVIDIA detector)
        x = x + p["conv"]["bias"][None, :, None, None]
    if "bn" in p:
        x = _bn(p["bn"], x)
    return jax.nn.relu(x)


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


def inception_v3_features(params, x, tf_layout=False):
    """x: [N, 3, 299, 299] in [-1, 1] -> [N, 2048] pool3 features.

    ``tf_layout=True`` reproduces the 2015-12-05 TF graph exactly
    (NVIDIA detector weights): Mixed_7c's pool branch is a MAX pool
    there (the pytorch-fid ``FIDInceptionE_2`` patch).
    """
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
        pooled = (_maxpool(x, 3, 1, 1) if tf_layout and blk == "Mixed_7c"
                  else _avgpool(x))
        bp = sub(blk, "branch_pool", pooled)
        x = jnp.concatenate([b1, b3, bd, bp], axis=1)

    return x.mean(axis=(2, 3))            # [N, 2048]


def inception_feature_fn(params, resize=True, tf_layout=False):
    """Returns fn(img_unit [-1,1] NCHW) -> [N, 2048]."""
    def fn(img):
        n, c, h, w = img.shape
        if resize and h != 299:
            img = jax.image.resize(img, (n, c, 299, 299), method="linear")
        return inception_v3_features(params, img, tf_layout=tf_layout)
    return fn


def inception_logits(params, x, tf_layout=False, no_output_bias=False):
    """[N, 3, 299, 299] -> class logits ([N, 1000] torchvision head /
    [N, 1008] NVIDIA head; the 'fc' entry of the converted tree).
    ``no_output_bias`` mirrors the reference Inception Score call
    (inception_score.py:23: detector_kwargs=dict(no_output_bias=True))."""
    feats = inception_v3_features(params, x, tf_layout=tf_layout)
    fc = params["fc"]
    logits = feats @ fc["weight"].T
    if not no_output_bias:
        logits = logits + fc["bias"]
    return logits


def nvidia_detector_fn(params, return_logits=False, no_output_bias=False):
    """The NVIDIA detector's calling convention: fn(images_255) with
    raw [N, 3, H, W] images in [0, 255], internal bilinear resize to
    299² and (x - 128) / 128 normalization (the TF classify_image
    graph's Sub/Mul preprocessing), TF-layout blocks.

    Pool features (FID/KID/PR) are returned by default;
    ``return_logits=True`` selects the 1008-way head for the Inception
    Score.
    """
    def fn(images_255):
        n, c, h, w = images_255.shape
        x = jnp.asarray(images_255, jnp.float32)
        if (h, w) != (299, 299):
            x = jax.image.resize(x, (n, c, 299, 299), method="linear")
        x = (x - 128.0) / 128.0
        if return_logits:
            return inception_logits(params, x, tf_layout=True,
                                    no_output_bias=no_output_bias)
        return inception_v3_features(params, x, tf_layout=True)
    return fn


# ---------------------------------------------------------------------------
# NVIDIA Inception-2015-12-05 detector conversion
#
# The detector pickle (metric_utils.py:44-57) is a persistence-pickled
# torch module whose submodules keep the TF classify_image graph names:
# a 'layers' stack (conv, conv_1, ..., mixed, mixed_1, ..., mixed_10)
# where each mixed block nests branches as tower/tower_1/tower_2, plus
# the 1008-way 'output' linear. These tables map every TF node onto the
# torchvision-style slots used by inception_v3_features (the same
# correspondence the pytorch-fid TF->PT conversion established).

_NV_STEM = {
    "conv": "Conv2d_1a_3x3", "conv_1": "Conv2d_2a_3x3",
    "conv_2": "Conv2d_2b_3x3", "conv_3": "Conv2d_3b_1x1",
    "conv_4": "Conv2d_4a_3x3",
}
_NV_BLOCKS = {
    "mixed": "Mixed_5b", "mixed_1": "Mixed_5c", "mixed_2": "Mixed_5d",
    "mixed_3": "Mixed_6a", "mixed_4": "Mixed_6b", "mixed_5": "Mixed_6c",
    "mixed_6": "Mixed_6d", "mixed_7": "Mixed_6e", "mixed_8": "Mixed_7a",
    "mixed_9": "Mixed_7b", "mixed_10": "Mixed_7c",
}
_NV_BRANCH_A = {
    "conv": "branch1x1",
    "tower.conv": "branch5x5_1", "tower.conv_1": "branch5x5_2",
    "tower_1.conv": "branch3x3dbl_1", "tower_1.conv_1": "branch3x3dbl_2",
    "tower_1.conv_2": "branch3x3dbl_3",
    "tower_2.conv": "branch_pool",
}
_NV_BRANCH_6A = {
    "conv": "branch3x3",
    "tower.conv": "branch3x3dbl_1", "tower.conv_1": "branch3x3dbl_2",
    "tower.conv_2": "branch3x3dbl_3",
}
_NV_BRANCH_C = {
    "conv": "branch1x1",
    "tower.conv": "branch7x7_1", "tower.conv_1": "branch7x7_2",
    "tower.conv_2": "branch7x7_3",
    "tower_1.conv": "branch7x7dbl_1", "tower_1.conv_1": "branch7x7dbl_2",
    "tower_1.conv_2": "branch7x7dbl_3", "tower_1.conv_3": "branch7x7dbl_4",
    "tower_1.conv_4": "branch7x7dbl_5",
    "tower_2.conv": "branch_pool",
}
_NV_BRANCH_7A = {
    "tower.conv": "branch3x3_1", "tower.conv_1": "branch3x3_2",
    "tower_1.conv": "branch7x7x3_1", "tower_1.conv_1": "branch7x7x3_2",
    "tower_1.conv_2": "branch7x7x3_3", "tower_1.conv_3": "branch7x7x3_4",
}
_NV_BRANCH_E = {
    "conv": "branch1x1",
    "tower.conv": "branch3x3_1",
    "tower.mixed.conv": "branch3x3_2a",
    "tower.mixed.conv_1": "branch3x3_2b",
    "tower_1.conv": "branch3x3dbl_1", "tower_1.conv_1": "branch3x3dbl_2",
    "tower_1.mixed.conv": "branch3x3dbl_3a",
    "tower_1.mixed.conv_1": "branch3x3dbl_3b",
    "tower_2.conv": "branch_pool",
}
_NV_BRANCH_BY_BLOCK = {
    "Mixed_5b": _NV_BRANCH_A, "Mixed_5c": _NV_BRANCH_A,
    "Mixed_5d": _NV_BRANCH_A, "Mixed_6a": _NV_BRANCH_6A,
    "Mixed_6b": _NV_BRANCH_C, "Mixed_6c": _NV_BRANCH_C,
    "Mixed_6d": _NV_BRANCH_C, "Mixed_6e": _NV_BRANCH_C,
    "Mixed_7a": _NV_BRANCH_7A, "Mixed_7b": _NV_BRANCH_E,
    "Mixed_7c": _NV_BRANCH_E,
}
# TF batchnorm leaf spellings (gamma is fixed at 1 in the 2015 graph —
# batch_norm without scale).
_NV_BN_LEAVES = {
    "beta": "bias", "gamma": "weight",
    "mean": "running_mean", "moving_mean": "running_mean",
    "running_mean": "running_mean",
    "var": "running_var", "variance": "running_var",
    "moving_variance": "running_var", "running_var": "running_var",
}


def _nv_assemble_conv(leaves: dict, what: str) -> dict:
    """One TF conv node's leaves -> {'conv': ..., 'bn': ...} slot.

    Handles both layouts found in the wild: BN kept separate
    (weight + beta/mean/var, gamma implied 1) and BN folded into the
    conv (weight + bias only).
    """
    import numpy as np

    if "weight" not in leaves:
        raise ValueError(f"NVIDIA inception: {what} has no conv weight "
                         f"(leaves: {sorted(leaves)})")
    w = jnp.asarray(np.asarray(leaves.pop("weight")), jnp.float32)
    if w.ndim != 4:
        raise ValueError(f"NVIDIA inception: {what}.weight is not a conv "
                         f"kernel (shape {w.shape})")
    node = {"conv": {"weight": w}}
    bn = {}
    for name in list(leaves):
        if name in _NV_BN_LEAVES:
            bn[_NV_BN_LEAVES[name]] = jnp.asarray(
                np.asarray(leaves.pop(name)), jnp.float32)
    if bn:
        bn.setdefault("weight", jnp.ones((w.shape[0],), jnp.float32))
        bn.setdefault("running_mean", jnp.zeros((w.shape[0],), jnp.float32))
        bn.setdefault("running_var", jnp.ones((w.shape[0],), jnp.float32))
        if "bias" not in bn:
            raise ValueError(f"NVIDIA inception: {what} has BN stats but "
                             "no beta")
        node["bn"] = bn
    elif "bias" in leaves:
        node["conv"]["bias"] = jnp.asarray(
            np.asarray(leaves.pop("bias")), jnp.float32)
    if leaves:
        raise ValueError(f"NVIDIA inception: unconsumed leaves in {what}: "
                         f"{sorted(leaves)}")
    return node


def convert_nvidia_inception(obj) -> dict:
    """NVIDIA Inception-2015-12-05 detector -> params for
    :func:`inception_v3_features` (use ``tf_layout=True`` /
    :func:`nvidia_detector_fn`).

    ``obj``: the loaded detector pickle — a CapturedModule from
    ``tgi.io.pickle_import.load_network_pkl``/``ReferenceUnpickler``, or
    a flat ``state_dict``-style mapping with the TF graph names. Every
    input key must map onto a known slot; anything unrecognized fails
    loudly (structural validation, not best-effort).
    """
    import numpy as np

    if not isinstance(obj, dict) or any(not isinstance(k, str)
                                        for k in obj):
        from tgi.io import captured_state_dict
        obj = captured_state_dict(obj)

    # Group leaves per TF conv node.
    grouped: dict = {}
    fc_leaves: dict = {}
    unmapped = []
    for key, value in obj.items():
        if "num_batches_tracked" in key:
            continue
        parts = key.split(".")
        if parts[0] == "layers":
            parts = parts[1:]
        if parts[0] == "output" or parts[0] == "fc":
            fc_leaves[parts[-1]] = value
            continue
        head, rest = parts[0], parts[1:]
        # Drop an explicit bn submodule level: conv.bn.beta == conv.beta.
        rest = [p for p in rest if p != "bn"]
        if head in _NV_STEM:
            slot = (_NV_STEM[head],)
            leaf_path = rest
        elif head in _NV_BLOCKS:
            block = _NV_BLOCKS[head]
            table = _NV_BRANCH_BY_BLOCK[block]
            # Longest branch-path prefix match ("tower.mixed.conv" before
            # "tower.conv").
            match = None
            for blen in range(len(rest) - 1, 0, -1):
                cand = ".".join(rest[:blen])
                if cand in table:
                    match = cand
                    break
            if match is None:
                unmapped.append(key)
                continue
            slot = (block, table[match])
            leaf_path = rest[len(match.split(".")):]
        else:
            unmapped.append(key)
            continue
        if len(leaf_path) != 1:
            unmapped.append(key)
            continue
        grouped.setdefault(slot, {})[leaf_path[0]] = value
    if unmapped:
        raise ValueError("NVIDIA inception: unrecognized keys "
                         f"(not the 2015-12-05 layout?): {unmapped[:8]}")

    params: dict = {}
    for slot, leaves in grouped.items():
        node = _nv_assemble_conv(leaves, ".".join(slot))
        if len(slot) == 1:
            params[slot[0]] = node
        else:
            params.setdefault(slot[0], {})[slot[1]] = node

    # Structural completeness vs the architecture skeleton.
    skeleton = inception_v3_init(jax.random.PRNGKey(0))
    missing = []
    for block, sub in skeleton.items():
        if "conv" in sub:             # stem conv slot
            if block not in params:
                missing.append(block)
            elif params[block]["conv"]["weight"].shape \
                    != sub["conv"]["weight"].shape:
                raise ValueError(
                    f"NVIDIA inception: {block} weight shape "
                    f"{params[block]['conv']['weight'].shape} != expected "
                    f"{sub['conv']['weight'].shape}")
            continue
        for name, exp in sub.items():
            got = params.get(block, {}).get(name)
            if got is None:
                missing.append(f"{block}.{name}")
            elif got["conv"]["weight"].shape != exp["conv"]["weight"].shape:
                raise ValueError(
                    f"NVIDIA inception: {block}.{name} weight shape "
                    f"{got['conv']['weight'].shape} != expected "
                    f"{exp['conv']['weight'].shape}")
    if missing:
        raise ValueError(f"NVIDIA inception: missing nodes: {missing[:8]}")

    if fc_leaves:
        w = jnp.asarray(np.asarray(fc_leaves["weight"]), jnp.float32)
        if w.shape[0] == 2048 and w.shape[1] != 2048:
            w = w.T                   # TF stores [in, out]
        fc = {"weight": w}
        if "bias" in fc_leaves:
            fc["bias"] = jnp.asarray(np.asarray(fc_leaves["bias"]),
                                     jnp.float32)
        else:
            fc["bias"] = jnp.zeros((w.shape[0],), jnp.float32)
        params["fc"] = fc
    return params


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
