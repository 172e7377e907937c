"""ResNet-34 pose estimator head.

Behavioral parity target: scripts/resnet/resnet.py:124-368 (torchvision
ResNet fork with a configurable ``output_dims`` head: 2 = euler yaw/pitch,
4 = quaternion, 6 = 6D rotation; selected in scripts/run_pti.py:36-45).

Param names mirror the torchvision state_dict (conv1, bn1, layer{1-4}.{i}.
conv{1,2}/bn{1,2}/downsample) so pretrained pose_estimator.pt weights port
by direct rename. BatchNorm runs in inference mode (running stats) — the
reference deep-copies the estimator with .eval() before per-image
fine-tuning (w_projector.py:62), so stats are frozen while weights train.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv_init(key, out_c, in_c, k):
    fan_in = in_c * k * k
    std = (2.0 / fan_in) ** 0.5
    return jax.random.normal(key, (out_c, in_c, k, k), jnp.float32) * std


def _bn_init(c):
    return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,))}


def _conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _bn(params, x, eps=1e-5):
    scale = params["weight"] * jax.lax.rsqrt(params["running_var"] + eps)
    shift = params["bias"] - params["running_mean"] * scale
    return x * scale[None, :, None, None] + shift[None, :, None, None]


BLOCKS_34 = (3, 4, 6, 3)
WIDTHS = (64, 128, 256, 512)


def resnet34_init(key, output_dims: int = 6, width_mult: float = 1.0,
                  blocks=BLOCKS_34):
    """``width_mult``/``blocks`` shrink the net (same residual topology;
    the apply path derives both from the params) for FLOP-light
    correctness checks like the multichip dryrun."""
    def sc(c):
        return max(1, int(round(c * width_mult)))

    keys = iter(jax.random.split(key, 64))
    params = {"conv1": {"weight": _conv_init(next(keys), sc(64), 3, 7)},
              "bn1": _bn_init(sc(64))}
    in_c = sc(64)
    widths = tuple(sc(w) for w in WIDTHS)
    for li, (n_blocks, width) in enumerate(zip(blocks, widths), start=1):
        layer = {}
        for bi in range(n_blocks):
            stride = 2 if (li > 1 and bi == 0) else 1
            block = {
                "conv1": {"weight": _conv_init(next(keys), width, in_c, 3)},
                "bn1": _bn_init(width),
                "conv2": {"weight": _conv_init(next(keys), width, width, 3)},
                "bn2": _bn_init(width),
            }
            if stride != 1 or in_c != width:
                block["downsample"] = {
                    "0": {"weight": _conv_init(next(keys), width, in_c, 1)},
                    "1": _bn_init(width),
                }
            layer[str(bi)] = block
            in_c = width
        params[f"layer{li}"] = layer
    # Reference head: fc(512->1000) -> relu -> fc2(1000->128) -> relu ->
    # fc3(128->output_dims) -> tanh (scripts/resnet/resnet.py:158-224).
    def linear(k, out_f, in_f):
        bound = (1.0 / in_f) ** 0.5
        kw, kb = jax.random.split(k)
        return {"weight": jax.random.uniform(kw, (out_f, in_f),
                                             minval=-bound, maxval=bound),
                "bias": jax.random.uniform(kb, (out_f,), minval=-bound,
                                           maxval=bound)}

    params["fc"] = linear(next(keys), sc(1000), widths[-1])
    params["fc2"] = linear(next(keys), sc(128), sc(1000))
    params["fc3"] = linear(next(keys), output_dims, sc(128))
    return params


def _basic_block(params, x, stride):
    identity = x
    out = _conv(x, params["conv1"]["weight"], stride=stride, padding=1)
    out = jax.nn.relu(_bn(params["bn1"], out))
    out = _conv(out, params["conv2"]["weight"], padding=1)
    out = _bn(params["bn2"], out)
    if "downsample" in params:
        identity = _bn(params["downsample"]["1"],
                       _conv(x, params["downsample"]["0"]["weight"],
                             stride=stride))
    return jax.nn.relu(out + identity)


def resnet34_apply(params, x, pre_tanh=False):
    """x: [N, 3, H, W] -> [N, output_dims].

    ``pre_tanh=True`` returns the final-layer pre-activation (used by
    tgi.invert.selfinv.aim_pose_net to compute an exact bias shift —
    a random-init head saturates tanh, so atanh(output) != fc3(...))."""
    x = _conv(x, params["conv1"]["weight"], stride=2, padding=3)
    x = jax.nn.relu(_bn(params["bn1"], x))
    # maxpool 3x3 stride 2 pad 1
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, 1, 3, 3), (1, 1, 2, 2),
                              ((0, 0), (0, 0), (1, 1), (1, 1)))
    for li in range(1, len(BLOCKS_34) + 1):
        # Block count read off the params so width/depth-scaled twins
        # (resnet34_init(..., blocks=...)) run through the same code.
        for bi in range(len(params[f"layer{li}"])):
            stride = 2 if (li > 1 and bi == 0) else 1
            x = _basic_block(params[f"layer{li}"][str(bi)], x, stride)
    x = x.mean(axis=(2, 3))  # adaptive avg pool to 1x1
    x = jax.nn.relu(x @ params["fc"]["weight"].T + params["fc"]["bias"])
    x = jax.nn.relu(x @ params["fc2"]["weight"].T + params["fc2"]["bias"])
    x = x @ params["fc3"]["weight"].T + params["fc3"]["bias"]
    if pre_tanh:
        return x
    return jnp.tanh(x)


def _bn_calibrated(params, x, eps=1e-5):
    """Return BN params whose running stats are the ACTUAL per-channel
    statistics of ``x`` (over N, H, W) — what one training step's
    moving-average update converges to on a fixed input distribution."""
    mean = x.mean(axis=(0, 2, 3))
    var = x.var(axis=(0, 2, 3))
    return {**params, "running_mean": mean,
            "running_var": jnp.maximum(var, eps)}


def resnet34_calibrate(params, x):
    """Calibrate every BatchNorm's running stats on input ``x`` (layer by
    layer, each BN seeing the activations produced by the already-
    calibrated prefix) and return the updated params.

    Purpose: a RANDOM-init ResNet-34 with identity BN stats (var=1)
    compounds activation variance through 34 layers — pre-head
    activations reach O(1e3), so (a) tanh saturates for every input and
    (b) the parameter->output Jacobian is ~1e5x a trained net's, making
    the reference's 6e-7 camera lr (hyperparameters.py:29-32) behave
    like a huge one. The reference's estimator is PRETRAINED
    (run_pti.py:36-45) with O(1) activations; calibrating the stats on
    the evaluation target restores that operating point without any
    external weights, so weight-free gates (tgi.invert.selfinv) measure
    the optimizer machinery, not random-init pathology. Conv/fc weights
    are untouched; inference stays frozen-stats as the reference's
    .eval() deep-copy (w_projector.py:62)."""
    params = dict(params)
    y = _conv(x, params["conv1"]["weight"], stride=2, padding=3)
    params["bn1"] = _bn_calibrated(params["bn1"], y)
    y = jax.nn.relu(_bn(params["bn1"], y))
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                              (1, 1, 3, 3), (1, 1, 2, 2),
                              ((0, 0), (0, 0), (1, 1), (1, 1)))
    for li in range(1, len(BLOCKS_34) + 1):
        layer = dict(params[f"layer{li}"])
        for bi in range(len(layer)):
            stride = 2 if (li > 1 and bi == 0) else 1
            block = dict(layer[str(bi)])
            out = _conv(y, block["conv1"]["weight"], stride=stride,
                        padding=1)
            block["bn1"] = _bn_calibrated(block["bn1"], out)
            out = jax.nn.relu(_bn(block["bn1"], out))
            out = _conv(out, block["conv2"]["weight"], padding=1)
            block["bn2"] = _bn_calibrated(block["bn2"], out)
            out = _bn(block["bn2"], out)
            identity = y
            if "downsample" in block:
                ds = dict(block["downsample"])
                idn = _conv(y, ds["0"]["weight"], stride=stride)
                ds["1"] = _bn_calibrated(ds["1"], idn)
                identity = _bn(ds["1"], idn)
                block["downsample"] = ds
            y = jax.nn.relu(out + identity)
            layer[str(bi)] = block
        params[f"layer{li}"] = layer
    return params


def convert_torch_state_dict(sd: dict) -> dict:
    """torchvision-style ResNet state_dict {name: numpy} -> params tree."""
    import numpy as np
    out: dict = {}
    for name, v in sd.items():
        if "num_batches_tracked" in name:
            continue
        parts = name.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(v), jnp.float32)
    return out
