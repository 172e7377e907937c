"""e4e (Encoder4Editing) latent initializer.

Behavioral parity target: models/e4e/encoders/psp_encoders.py:124-200 +
models/e4e/psp.py:17-64 (pSp2). The IR-SE50 trunk feeds an FPN whose
GradualStyleBlocks produce w0 + progressive per-layer deltas; the pSp2
wrapper used by the inversion pipeline returns only ``codes[:, 0, :]``
(psp.py:64), i.e. styles[0](c3) — but the full progressive encoder is
implemented for capability parity.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tgi.models.irse import conv, conv_init, trunk_apply, trunk_init

STYLE_COUNT = 18           # log2(1024)*2 - 2 (psp_encoders.py:147)
COARSE_IND = 3
MIDDLE_IND = 7
TAPS = (6, 20, 23)         # c1 (128ch), c2 (256ch), c3 (512ch)


def _equal_linear_init(key, in_f, out_f):
    # rosinality EqualLinear: weight ~ N(0,1)/lr_mul, runtime scale
    # 1/sqrt(in_f).
    return {"weight": jax.random.normal(key, (out_f, in_f)),
            "bias": jnp.zeros((out_f,))}


def _equal_linear_apply(p, x):
    scale = 1.0 / math.sqrt(p["weight"].shape[1])
    return x @ (p["weight"].T * scale) + p["bias"]


def gradual_style_block_init(key, in_c, out_c, spatial):
    num_pools = int(math.log2(spatial))
    keys = jax.random.split(key, num_pools + 1)
    convs = {"0": {"weight": conv_init(keys[0], out_c, in_c, 3),
                   "bias": jnp.zeros((out_c,))}}
    for i in range(1, num_pools):
        convs[str(2 * i)] = {"weight": conv_init(keys[i], out_c, out_c, 3),
                             "bias": jnp.zeros((out_c,))}
    return {"convs": convs, "linear": _equal_linear_init(keys[-1], out_c,
                                                         out_c)}


def gradual_style_block_apply(p, x, spatial):
    num_pools = int(math.log2(spatial))
    for i in range(num_pools):
        c = p["convs"][str(2 * i)]
        x = conv(x, c["weight"], stride=2, padding=1, bias=c["bias"])
        x = jnp.where(x >= 0, x, 0.01 * x)   # nn.LeakyReLU default slope
    x = x.reshape(x.shape[0], -1)
    return _equal_linear_apply(p["linear"], x)


def _upsample_add(x, y):
    """Bilinear align_corners=True upsample of x to y's size, plus y
    (helpers.py:124-140)."""
    n, c, h, w = y.shape
    # align_corners=True resize: linear interpolation of corner-aligned grid.
    xs = jnp.linspace(0, x.shape[2] - 1, h)
    ys = jnp.linspace(0, x.shape[3] - 1, w)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, x.shape[2] - 1)
    y1 = jnp.minimum(y0 + 1, x.shape[3] - 1)
    wx = (xs - x0)[None, None, :, None]
    wy = (ys - y0)[None, None, None, :]
    g = x[:, :, x0][:, :, :, y0] * (1 - wx) * (1 - wy) \
        + x[:, :, x0][:, :, :, y1] * (1 - wx) * wy \
        + x[:, :, x1][:, :, :, y0] * wx * (1 - wy) \
        + x[:, :, x1][:, :, :, y1] * wx * wy
    return g + y


def e4e_init(key, num_layers=50):
    keys = jax.random.split(key, STYLE_COUNT + 3)
    params = trunk_init(keys[0], num_layers=num_layers, se=True)
    styles = {}
    for i in range(STYLE_COUNT):
        spatial = 16 if i < COARSE_IND else (32 if i < MIDDLE_IND else 64)
        styles[str(i)] = gradual_style_block_init(keys[i + 1], 512, 512,
                                                  spatial)
    params["styles"] = styles
    params["latlayer1"] = {"weight": conv_init(keys[-2], 512, 256, 1),
                           "bias": jnp.zeros((512,))}
    params["latlayer2"] = {"weight": conv_init(keys[-1], 512, 128, 1),
                           "bias": jnp.zeros((512,))}
    return params


def e4e_apply(params, x, num_layers=50, progressive_stage=STYLE_COUNT):
    """x: [N, 3, 256, 256] (raw [0,255] as the pipeline feeds it) ->
    [N, 18, 512] w+ codes."""
    _, taps = trunk_apply(params, x, num_layers=num_layers, se=True,
                          taps=TAPS)
    c1, c2, c3 = taps[6], taps[20], taps[23]

    w0 = gradual_style_block_apply(params["styles"]["0"], c3, 16)
    w = jnp.tile(w0[:, None, :], (1, STYLE_COUNT, 1))

    features = c3
    p2 = p1 = None
    for i in range(1, min(progressive_stage + 1, STYLE_COUNT)):
        if i == COARSE_IND:
            p2 = _upsample_add(c3, conv(c2, params["latlayer1"]["weight"],
                                        bias=params["latlayer1"]["bias"]))
            features = p2
        elif i == MIDDLE_IND:
            p1 = _upsample_add(p2, conv(c1, params["latlayer2"]["weight"],
                                        bias=params["latlayer2"]["bias"]))
            features = p1
        spatial = 16 if i < COARSE_IND else (32 if i < MIDDLE_IND else 64)
        delta = gradual_style_block_apply(params["styles"][str(i)], features,
                                          spatial)
        w = w.at[:, i].add(delta)
    return w


def convert_psp_checkpoint(ckpt: dict, validate: bool = True):
    """Port a published e4e/pSp checkpoint -> (params, latent_avg).

    Handles the real artifact layouts:

    * the reference's own initializer: ``DataParallel(pSp2)`` state_dict
      (scripts/run_pti.py:33-49) — keys ``module.encoder.*``;
    * the official e4e-repo full dump (psp.py:31-40): weights nested
      under ``state_dict`` with ``encoder.`` / ``decoder.`` prefixes
      plus a top-level ``latent_avg`` tensor — only the ``encoder.``
      subtree (psp.py:36) and ``latent_avg`` are loaded;
    * a bare ``Encoder4Editing.state_dict()`` dump (no prefixes).

    ``decoder.`` (a rosinality SG2 the pipeline never calls) and
    ``opts`` are ignored. The converted tree is structurally validated
    against ``e4e_init`` (keys + shapes) so a wrong file fails loudly
    instead of mis-nesting.
    """
    import numpy as np

    from tgi.io.validate import expected_spec, validate_tree

    latent_avg = None
    if "latent_avg" in ckpt:
        latent_avg = jnp.asarray(np.asarray(ckpt["latent_avg"]),
                                 jnp.float32)
    sd = ckpt.get("state_dict", ckpt)
    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in sd.items()}
    has_prefix = any(k.startswith("encoder.") for k in sd)
    params: dict = {}
    for name, v in sd.items():
        if has_prefix:
            if not name.startswith("encoder."):
                continue            # decoder.* / face_pool / opts etc.
            name = name[len("encoder."):]
        elif name.startswith("decoder.") or "." not in name:
            continue
        if "num_batches_tracked" in name or "progressive_stage" in name:
            continue
        parts = name.split(".")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(v), jnp.float32)
    if validate:
        validate_tree(params, expected_spec(e4e_init, jax.random.PRNGKey(0)),
                      "e4e encoder")
    return params, latent_avg


def e4e_encode_w0(params, x, num_layers=50):
    """pSp2.forward equivalent: only the first style code (psp.py:64)."""
    _, taps = trunk_apply(params, x, num_layers=num_layers, se=True,
                          taps=(23,))
    return gradual_style_block_apply(params["styles"]["0"], taps[23], 16)
