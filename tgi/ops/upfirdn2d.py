"""Pad / upsample / FIR-filter / downsample for batches of 2D images.

TPU-native equivalent of the reference CUDA op
(torch_utils/ops/upfirdn2d.py:120-164 + upfirdn2d.cu). Instead of a
hand-written kernel, the whole pipeline collapses into a *single* XLA
convolution: zero-insertion upsampling is ``lhs_dilation``, the pad/crop is
the convolution padding (XLA supports negative padding = cropping), the FIR
filter is a depthwise kernel, and decimation is ``window_strides``. XLA
lowers this to fused VPU code on TPU; gradients of arbitrary order come
from ``jax.grad`` for free (the reference needed a hand-written swapped
up/down backward, upfirdn2d.py:252-271).

Layout is NCHW to match the reference weight conventions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tgi.ops.filters import filter_size, parse_padding, parse_scaling


def _depthwise_fir(x: jax.Array, f: np.ndarray, *, up, down, pad) -> jax.Array:
    """One dilated/strided depthwise convolution implementing upfirdn."""
    num_channels = x.shape[1]
    upx, upy = up
    downx, downy = down
    padx0, padx1, pady0, pady1 = pad

    # Zero insertion appends up-1 zeros AFTER each sample; lhs_dilation only
    # inserts BETWEEN samples, so fold the trailing zeros into the padding.
    pady1 += upy - 1
    padx1 += upx - 1

    kernel = jnp.asarray(f, dtype=x.dtype)
    if kernel.ndim == 1:
        # Separable: run the 1D filter along W then along H.
        kw = kernel.shape[0]
        kx = jnp.tile(kernel.reshape(1, 1, 1, kw), (num_channels, 1, 1, 1))
        ky = jnp.tile(kernel.reshape(1, 1, kw, 1), (num_channels, 1, 1, 1))
        x = jax.lax.conv_general_dilated(
            x, kx, window_strides=(1, downx), padding=((0, 0), (padx0, padx1)),
            lhs_dilation=(1, upx), feature_group_count=num_channels,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.lax.conv_general_dilated(
            x, ky, window_strides=(downy, 1), padding=((pady0, pady1), (0, 0)),
            lhs_dilation=(upy, 1), feature_group_count=num_channels,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return x
    fh, fw = kernel.shape
    k = jnp.tile(kernel.reshape(1, 1, fh, fw), (num_channels, 1, 1, 1))
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(downy, downx),
        padding=((pady0, pady1), (padx0, padx1)),
        lhs_dilation=(upy, upx), feature_group_count=num_channels,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def upfirdn2d(x: jax.Array, f, up=1, down=1, padding=0,
              flip_filter: bool = False, gain: float = 1.0) -> jax.Array:
    """Upsample by zero insertion, pad/crop, FIR filter, downsample.

    Args:
        x: ``[N, C, H, W]`` input.
        f: prepared float32 filter (see :func:`tgi.ops.setup_filter`):
           ``[fh, fw]``, separable ``[taps]`` or ``None`` (identity).
        up / down: int or (x, y) integer resampling factors.
        padding: int, ``[x, y]`` or ``[x0, x1, y0, y1]`` w.r.t. the
            upsampled image; negative values crop.
        flip_filter: False = convolution, True = correlation.
        gain: overall magnitude scaling.

    Returns:
        ``[N, C, out_h, out_w]`` tensor, same dtype as ``x``.
    """
    assert x.ndim == 4
    if f is None:
        f = np.ones((1, 1), dtype=np.float32)
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (1, 2)
    upx, upy = parse_scaling(up)
    downx, downy = parse_scaling(down)
    pad = parse_padding(padding)

    in_h, in_w = x.shape[2], x.shape[3]
    up_w = in_w * upx + pad[0] + pad[1]
    up_h = in_h * upy + pad[2] + pad[3]
    assert up_w >= f.shape[-1] and up_h >= f.shape[0], (
        f"upsampled buffer {up_h}x{up_w} smaller than filter {f.shape}")

    f = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        f = f[::-1] if f.ndim == 1 else f[::-1, ::-1]
    # XLA's conv computes cross-correlation; the flip above converts the
    # requested convolution into the equivalent correlation.
    return _depthwise_fir(x, np.ascontiguousarray(f), up=(upx, upy),
                          down=(downx, downy), pad=pad)


def filter2d(x, f, padding=0, flip_filter=False, gain=1.0):
    """FIR-filter with implicit 'same' padding (reference filter2d)."""
    padx0, padx1, pady0, pady1 = parse_padding(padding)
    fw, fh = filter_size(f)
    p = [padx0 + fw // 2, padx1 + (fw - 1) // 2,
         pady0 + fh // 2, pady1 + (fh - 1) // 2]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1.0):
    """FIR-interpolated upsampling (reference upsample2d)."""
    upx, upy = parse_scaling(up)
    padx0, padx1, pady0, pady1 = parse_padding(padding)
    fw, fh = filter_size(f)
    p = [padx0 + (fw + upx - 1) // 2, padx1 + (fw - upx) // 2,
         pady0 + (fh + upy - 1) // 2, pady1 + (fh - upy) // 2]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter,
                     gain=gain * upx * upy)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1.0):
    """FIR-antialiased downsampling (reference downsample2d)."""
    downx, downy = parse_scaling(down)
    padx0, padx1, pady0, pady1 = parse_padding(padding)
    fw, fh = filter_size(f)
    p = [padx0 + (fw - downx + 1) // 2, padx1 + (fw - downx) // 2,
         pady0 + (fh - downy + 1) // 2, pady1 + (fh - downy) // 2]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter,
                     gain=gain)
