"""Fused bias + activation + gain + clamp.

TPU-native equivalent of the reference CUDA op
(torch_utils/ops/bias_act.py:54-126 + bias_act.cu). On TPU there is no
hand-written kernel: the chain is plain jnp elementwise math that XLA fuses
into the producing matmul/conv, and ``jax.grad`` provides arbitrary-order
gradients (the reference needed a dedicated second-order autograd.Function
for R1/path-length regularizers).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ActivationSpec:
    func: Callable
    def_alpha: float
    def_gain: float


activation_funcs: dict[str, ActivationSpec] = {
    "linear": ActivationSpec(lambda x, alpha: x, 0.0, 1.0),
    "relu": ActivationSpec(lambda x, alpha: jnp.maximum(x, 0), 0.0, math.sqrt(2)),
    "lrelu": ActivationSpec(lambda x, alpha: jnp.where(x >= 0, x, x * alpha),
                            0.2, math.sqrt(2)),
    "tanh": ActivationSpec(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": ActivationSpec(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": ActivationSpec(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": ActivationSpec(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": ActivationSpec(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": ActivationSpec(lambda x, alpha: jax.nn.sigmoid(x) * x, 0.0,
                            math.sqrt(2)),
}


def bias_act(x: jax.Array, b: jax.Array | None = None, dim: int = 1,
             act: str = "linear", alpha: float | None = None,
             gain: float | None = None, clamp: float | None = None) -> jax.Array:
    """Add bias along ``dim``, apply ``act``, scale by ``gain``, clamp.

    Mirrors reference bias_act semantics (torch_utils/ops/bias_act.py:84-126):
    default gain is the activation's variance-preserving gain and clamping
    is symmetric ``[-clamp, clamp]``.
    """
    spec = activation_funcs[act]
    alpha = float(spec.def_alpha if alpha is None else alpha)
    gain = float(spec.def_gain if gain is None else gain)

    if b is not None:
        assert b.ndim == 1 and 0 <= dim < x.ndim
        assert b.shape[0] == x.shape[dim]
        x = x + b.astype(x.dtype).reshape(
            [-1 if i == dim else 1 for i in range(x.ndim)])
    x = spec.func(x, alpha)
    if gain != 1:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp is not None:
        assert clamp >= 0
        x = jnp.clip(x, -clamp, clamp)
    return x
