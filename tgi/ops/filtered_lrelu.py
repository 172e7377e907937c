"""Filtered leaky ReLU (StyleGAN3 antialiased nonlinearity).

TPU-native equivalent of the reference mega-kernel
(torch_utils/ops/filtered_lrelu.py:58-150 + filtered_lrelu.cu). On TPU the
op is the composition bias -> up-FIR -> lrelu/gain/clamp -> down-FIR, each
stage an XLA conv or fused elementwise op; XLA's fusion plays the role of
the hand-scheduled CUDA kernel and its packed sign tensor (rematerialized
activations come from ``jax.checkpoint`` when memory-bound).
"""

from __future__ import annotations

import math

import jax

from tgi.ops.bias_act import bias_act
from tgi.ops.filters import parse_padding
from tgi.ops.upfirdn2d import upfirdn2d


def filtered_lrelu(x: jax.Array, fu=None, fd=None, b=None, up: int = 1,
                   down: int = 1, padding=0, gain: float = math.sqrt(2),
                   slope: float = 0.2, clamp: float | None = None,
                   flip_filter: bool = False) -> jax.Array:
    """bias -> zero-insert upsample -> FIR -> lrelu(gain, clamp) -> FIR -> down."""
    assert x.ndim == 4
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    px0, px1, py0, py1 = parse_padding(padding)
    x = bias_act(x, b)
    x = upfirdn2d(x, fu, up=up, padding=[px0, px1, py0, py1], gain=up ** 2,
                  flip_filter=flip_filter)
    x = bias_act(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter)
    return x
