"""Fused multiply-add.

The reference needed a custom autograd.Function for broadcast-aware
gradients (torch_utils/ops/fma.py:17-47); in JAX this is a single
expression that XLA fuses and differentiates natively.
"""

import jax.numpy as jnp


def fma(a, b, c):
    """a * b + c with broadcasting."""
    return a * b + c
