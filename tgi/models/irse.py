"""IR / IR-SE residual blocks shared by the ArcFace and e4e encoders.

Behavioral parity target: models/e4e/encoders/helpers.py:22-121 (
bottleneck_IR, bottleneck_IR_SE, SEModule, get_blocks). Param names follow
the torch Sequential indices (res_layer.0 = BN, .1 = conv, ...) so
pretrained ir_se50 checkpoints port by rename.

BatchNorm runs with frozen running statistics (these encoders are always
used in eval mode in the pipeline — run_pti.py:33-51).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv(x, w, stride=1, padding=0, bias=None):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if bias is not None:
        y = y + bias.astype(x.dtype)[None, :, None, None]
    return y


def batchnorm(p, x, eps=1e-5):
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    shift = p["bias"] - p["running_mean"] * scale
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def prelu(p, x):
    a = p["weight"].astype(x.dtype)[None, :, None, None]
    return jnp.where(x >= 0, x, a * x)


def bn_init(c):
    return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,))}


def conv_init(key, out_c, in_c, k):
    std = (2.0 / (in_c * k * k)) ** 0.5
    return jax.random.normal(key, (out_c, in_c, k, k), jnp.float32) * std


def get_blocks(num_layers: int):
    """(in_channel, depth, stride) specs (helpers.py:26-54)."""
    def block(in_c, depth, num_units, stride=2):
        return [(in_c, depth, stride)] + [(depth, depth, 1)] * (num_units - 1)

    if num_layers == 50:
        units = [(64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)]
    elif num_layers == 100:
        units = [(64, 64, 3), (64, 128, 13), (128, 256, 30), (256, 512, 3)]
    elif num_layers == 152:
        units = [(64, 64, 3), (64, 128, 8), (128, 256, 36), (256, 512, 3)]
    else:
        raise ValueError(num_layers)
    out = []
    for in_c, depth, n in units:
        out += block(in_c, depth, n)
    return out


def se_module_init(key, channels, reduction=16):
    k1, k2 = jax.random.split(key)
    return {"fc1": {"weight": conv_init(k1, channels // reduction, channels, 1)},
            "fc2": {"weight": conv_init(k2, channels, channels // reduction, 1)}}


def se_module_apply(p, x):
    s = x.mean(axis=(2, 3), keepdims=True)
    s = jax.nn.relu(conv(s, p["fc1"]["weight"]))
    s = jax.nn.sigmoid(conv(s, p["fc2"]["weight"]))
    return x * s


def bottleneck_init(key, in_c, depth, stride, se: bool):
    keys = jax.random.split(key, 4)
    p = {
        "res_layer": {
            "0": bn_init(in_c),
            "1": {"weight": conv_init(keys[0], depth, in_c, 3)},
            "2": {"weight": jnp.full((depth,), 0.25)},      # PReLU
            "3": {"weight": conv_init(keys[1], depth, depth, 3)},
            "4": bn_init(depth),
        }
    }
    if se:
        p["res_layer"]["5"] = se_module_init(keys[2], depth)
    if in_c != depth:
        p["shortcut_layer"] = {"0": {"weight": conv_init(keys[3], depth,
                                                         in_c, 1)},
                               "1": bn_init(depth)}
    return p


def bottleneck_apply(p, x, in_c, depth, stride, se: bool):
    if in_c == depth:
        # MaxPool2d(1, stride): pure stride-subsampling.
        shortcut = x[:, :, ::stride, ::stride]
    else:
        shortcut = batchnorm(p["shortcut_layer"]["1"],
                             conv(x, p["shortcut_layer"]["0"]["weight"],
                                  stride=stride))
    r = p["res_layer"]
    y = batchnorm(r["0"], x)
    y = conv(y, r["1"]["weight"], padding=1)
    y = prelu(r["2"], y)
    y = conv(y, r["3"]["weight"], stride=stride, padding=1)
    y = batchnorm(r["4"], y)
    if se:
        y = se_module_apply(r["5"], y)
    return y + shortcut


def trunk_init(key, num_layers=50, se=True):
    """input_layer + body of the IR(-SE) trunk."""
    specs = get_blocks(num_layers)
    keys = jax.random.split(key, len(specs) + 1)
    params = {
        "input_layer": {
            "0": {"weight": conv_init(keys[-1], 64, 3, 3)},
            "1": bn_init(64),
            "2": {"weight": jnp.full((64,), 0.25)},
        },
        "body": {str(i): bottleneck_init(k, in_c, d, s, se)
                 for i, (k, (in_c, d, s)) in enumerate(zip(keys, specs))},
    }
    return params


def trunk_apply(params, x, num_layers=50, se=True, taps=()):
    """Run input_layer + body; optionally collect activations after the
    body block indices in ``taps`` (e4e uses 6 / 20 / 23)."""
    il = params["input_layer"]
    x = prelu(il["2"], batchnorm(il["1"], conv(x, il["0"]["weight"],
                                               padding=1)))
    collected = {}
    for i, (in_c, d, s) in enumerate(get_blocks(num_layers)):
        x = bottleneck_apply(params["body"][str(i)], x, in_c, d, s, se)
        if i in taps:
            collected[i] = x
    return (x, collected) if taps else x
