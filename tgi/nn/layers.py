"""Core StyleGAN2 layers as functional pytree modules.

Design: every module is an ``init`` returning a nested dict of arrays whose
keys mirror the reference state_dict names (networks_stylegan2.py) so the
pickle converter (tgi.io.pickle_import) is a pure rename, plus an ``apply``
that is jit/grad/vmap-transparent. Equalized learning rate scaling is
applied at runtime exactly as in the reference.

Behavioral parity targets:
  FullyConnectedLayer  networks_stylegan2.py:95-130
  Conv2dLayer          networks_stylegan2.py:134-188
  modulated_conv2d     networks_stylegan2.py:33-91
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from tgi.ops import bias_act, conv2d_resample
from tgi.ops.filters import setup_filter


def normalize_2nd_moment(x, axis=1, eps=1e-8):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis,
                                      keepdims=True) + eps)


# ---------------------------------------------------------------------------
# FullyConnectedLayer


def fully_connected_init(key, in_features, out_features, bias=True,
                         lr_multiplier=1.0, bias_init=0.0):
    params = {
        "weight": jax.random.normal(key, (out_features, in_features),
                                    jnp.float32) / lr_multiplier,
    }
    if bias:
        params["bias"] = jnp.full((out_features,), float(bias_init),
                                  jnp.float32)
    return params


def fully_connected_apply(params, x, activation="linear", lr_multiplier=1.0):
    in_features = params["weight"].shape[1]
    weight_gain = lr_multiplier / math.sqrt(in_features)
    w = params["weight"].astype(x.dtype) * weight_gain
    b = params.get("bias")
    if b is not None:
        b = b.astype(x.dtype)
        if lr_multiplier != 1:
            b = b * lr_multiplier
    x = x @ w.T
    return bias_act(x, b, act=activation)


# ---------------------------------------------------------------------------
# Conv2dLayer (plain conv with optional resampling; used by D and SR)


def conv2d_layer_init(key, in_channels, out_channels, kernel_size, bias=True):
    params = {
        "weight": jax.random.normal(
            key, (out_channels, in_channels, kernel_size, kernel_size),
            jnp.float32),
    }
    if bias:
        params["bias"] = jnp.zeros((out_channels,), jnp.float32)
    return params


def conv2d_layer_apply(params, x, activation="linear", up=1, down=1,
                       resample_filter=(1, 3, 3, 1), conv_clamp=None,
                       gain=1.0):
    out_c, in_c, kh, kw = params["weight"].shape
    weight_gain = 1 / math.sqrt(in_c * kh * kw)
    act_gain_tbl = {"linear": 1.0, "lrelu": math.sqrt(2),
                    "relu": math.sqrt(2)}
    w = params["weight"].astype(x.dtype) * weight_gain
    b = params.get("bias")
    f = setup_filter(list(resample_filter)) if (up > 1 or down > 1) else None
    x = conv2d_resample(x, w, f=f, up=up, down=down, padding=kh // 2,
                        flip_weight=(up == 1))
    act_gain = act_gain_tbl.get(activation, 1.0) * gain
    act_clamp = conv_clamp * gain if conv_clamp is not None else None
    return bias_act(x, b.astype(x.dtype) if b is not None else None,
                    act=activation, gain=act_gain, clamp=act_clamp)


# ---------------------------------------------------------------------------
# Modulated conv


def modulated_conv2d(x, weight, styles, noise=None, up=1, down=1, padding=0,
                     resample_filter=None, demodulate=True, flip_weight=True,
                     pre_normalize=False):
    """Style-modulated, demodulated convolution.

    TPU-first choice: always the *unfused* formulation (scale activations by
    styles before the conv, by demod coefficients after) — it keeps the conv
    a regular batched NCHW conv that XLA tiles onto the MXU, instead of the
    reference's grouped per-sample-weight conv (networks_stylegan2.py:81-91)
    which XLA would serialize. The two are algebraically identical.

    Args:
        x: [N, C_in, H, W].
        weight: [C_out, C_in, kh, kw] (shared across batch).
        styles: [N, C_in] modulation.
        noise: optional broadcastable noise added after demodulation.
        pre_normalize: inf-norm pre-normalization of weight and styles,
            mirroring the reference fp16 overflow guard; enable for bf16.
    """
    N = x.shape[0]
    out_c, in_c, kh, kw = weight.shape

    if pre_normalize and demodulate:
        # bf16/fp16 pre-normalization (networks_stylegan2.py:54-56).
        weight = weight * (1 / math.sqrt(in_c * kh * kw) /
                           jnp.max(jnp.abs(weight), axis=(1, 2, 3),
                                   keepdims=True))
        styles = styles / jnp.max(jnp.abs(styles), axis=1, keepdims=True)

    dcoefs = None
    if demodulate:
        # [N, O]: rsqrt of sum over (I, kh, kw) of (w * s)^2, computed
        # without materializing the [N, O, I, kh, kw] tensor:
        w2 = jnp.square(weight).reshape(out_c, in_c, kh * kw).sum(-1)  # [O, I]
        dcoefs = jax.lax.rsqrt(
            jnp.square(styles) @ w2.T + 1e-8)                           # [N, O]

    x = x * styles.astype(x.dtype)[:, :, None, None]
    x = conv2d_resample(x, weight.astype(x.dtype), f=resample_filter, up=up,
                        down=down, padding=padding, flip_weight=flip_weight)
    if demodulate and noise is not None:
        x = x * dcoefs.astype(x.dtype)[:, :, None, None] + noise.astype(x.dtype)
    elif demodulate:
        x = x * dcoefs.astype(x.dtype)[:, :, None, None]
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x
