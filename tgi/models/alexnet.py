"""AlexNet feature trunk + LPIPS metric head (the lpips package's
``LPIPS(net='alex')``).

The reference tunes stage 2 with AlexNet-LPIPS (configs/hyperparameters.py:2
``lpips_type = 'alex'``; training/coaches/base_coach.py:48) and early-stops
at LPIPS <= 0.06 on that scale (single_id_coach.py:69) — the threshold is
calibrated to the alex backbone, so tgi reproduces it exactly rather than
substituting VGG.

Architecture (torchvision ``alexnet().features`` layout, as sliced by the
lpips package):

    0 Conv(3,64,k11,s4,p2)  1 ReLU          -> stage 1 (relu1)
    2 MaxPool(k3,s2)  3 Conv(64,192,k5,p2)   4 ReLU   -> stage 2
    5 MaxPool         6 Conv(192,384,k3,p1)  7 ReLU   -> stage 3
    8 Conv(384,256,k3,p1)  9 ReLU                      -> stage 4
    10 Conv(256,256,k3,p1) 11 ReLU                     -> stage 5

LPIPS(in0, in1) = sum_l mean_hw( sum_c w_lc * (n(f_l(s(in0))) -
n(f_l(s(in1))))^2 ) with s the fixed scaling layer and n channel-unit
normalization (lpips/lpips.py upstream). Param names mirror the torch
state_dict (``net.slice{k}.{idx}`` / ``lin{l}.model.1``) so pretrained
weights port by rename via :func:`convert_lpips_alex`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# torchvision alexnet.features conv layout: idx -> (cin, cout, kernel,
# stride, pad)
ALEXNET_CONVS = {
    0: (3, 64, 11, 4, 2),
    3: (64, 192, 5, 1, 2),
    6: (192, 384, 3, 1, 1),
    8: (384, 256, 3, 1, 1),
    10: (256, 256, 3, 1, 1),
}
ALEXNET_POOLS = (2, 5)          # only pools BEFORE the last lpips stage
# Last ReLU index of each LPIPS stage (relu1 .. relu5).
ALEX_STAGES = (1, 4, 7, 9, 11)
ALEX_CHANNELS = (64, 192, 384, 256, 256)

# lpips ScalingLayer constants (lpips/lpips.py): input is in [-1, 1].
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])


def alexnet_init(key):
    params = {"features": {}}
    keys = jax.random.split(key, len(ALEXNET_CONVS))
    for k, (idx, (cin, cout, ksz, _, _)) in zip(keys, ALEXNET_CONVS.items()):
        std = (2.0 / (cin * ksz * ksz)) ** 0.5
        params["features"][str(idx)] = {
            "weight": jax.random.normal(k, (cout, cin, ksz, ksz)) * std,
            "bias": jnp.zeros((cout,)),
        }
    return params


def alex_head_init(key):
    """Per-stage 1x1 linear weights (lpips 'lin' layers), non-negative."""
    keys = jax.random.split(key, len(ALEX_CHANNELS))
    return {f"lin{i}": {"weight": jnp.abs(jax.random.normal(k, (c,)) * 0.1)}
            for i, (k, c) in enumerate(zip(keys, ALEX_CHANNELS))}


def _conv(x, p, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["bias"].astype(x.dtype)[None, :, None, None]


def _maxpool3s2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 1, 3, 3), (1, 1, 2, 2),
                                 ((0, 0), (0, 0), (0, 0), (0, 0)))


def alexnet_stage_features(params, x):
    """Run the trunk on pre-scaled input; return the 5 stage activations."""
    acts = []
    for idx in range(ALEX_STAGES[-1] + 1):
        if idx in ALEXNET_CONVS:
            _, _, _, stride, pad = ALEXNET_CONVS[idx]
            x = _conv(x, params["features"][str(idx)], stride, pad)
        elif idx in ALEXNET_POOLS:
            x = _maxpool3s2(x)
        else:
            x = jax.nn.relu(x)
        if idx in ALEX_STAGES:
            acts.append(x)
    return acts


def alex_lpips_embed(params, head_params, images_unit):
    """LPIPS feature embedding of [-1, 1] images: flat [N, D] vectors whose
    squared L2 difference IS ``lpips.LPIPS(net='alex')(a, b)``.

    Matches lpips/lpips.py forward: scaling layer, per-stage channel unit
    normalization ``x / (||x||_c + 1e-10)``, lin-layer weights, spatial
    average (folded in as 1/sqrt(HW)).
    """
    x = (images_unit - _SHIFT[None, :, None, None]) / \
        _SCALE[None, :, None, None]
    acts = alexnet_stage_features(params, x)
    N = images_unit.shape[0]
    feats = []
    for i, a in enumerate(acts):
        norm = jnp.sqrt(jnp.sum(jnp.square(a), axis=1, keepdims=True))
        a = a / (norm + 1e-10)
        w = head_params[f"lin{i}"]["weight"]
        a = a * jnp.sqrt(jnp.maximum(w, 0.0))[None, :, None, None]
        hw = a.shape[2] * a.shape[3]
        feats.append((a / jnp.sqrt(hw)).reshape(N, -1))
    return jnp.concatenate(feats, axis=-1)


def alex_lpips_distance(params, head_params, img_a_unit, img_b_unit):
    """lpips.LPIPS(net='alex')(a, b) for [-1, 1] images -> [N]."""
    fa = alex_lpips_embed(params, head_params, img_a_unit)
    fb = alex_lpips_embed(params, head_params, img_b_unit)
    return jnp.sum(jnp.square(fa - fb), axis=-1)


def convert_lpips_alex(sd: dict) -> tuple[dict, dict]:
    """lpips-package ``LPIPS(net='alex')`` state_dict -> (trunk, head).

    Handles both the full-model dict (``net.slice1.0.weight`` /
    ``lin0.model.1.weight``, also the ``lins.0...`` alias) and a bare
    torchvision ``alexnet`` dict (``features.0.weight``) for the trunk.
    """
    import numpy as np

    # lpips slices net.slice{k}.{torchvision idx}: slice boundaries are at
    # the stage ReLUs, so the inner index IS the torchvision features index.
    params = {"features": {}}
    head = {}
    for name, v in sd.items():
        arr = np.asarray(v)
        parts = name.split(".")
        if parts[0].startswith("net") and parts[1].startswith("slice"):
            idx = parts[2]
            if idx in {str(i) for i in ALEXNET_CONVS}:
                params["features"].setdefault(idx, {})[parts[3]] = \
                    jnp.asarray(arr, jnp.float32)
        elif parts[0] == "features" and parts[1] in \
                {str(i) for i in ALEXNET_CONVS}:
            params["features"].setdefault(parts[1], {})[parts[2]] = \
                jnp.asarray(arr, jnp.float32)
    for i in range(5):
        for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if k in sd:
                head[f"lin{i}"] = {"weight": jnp.asarray(
                    np.asarray(sd[k]).reshape(-1), jnp.float32)}
    return params, head
