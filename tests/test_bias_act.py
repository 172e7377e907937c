"""Parity tests for tgi.ops.bias_act against torch activations."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tgi.ops import bias_act, activation_funcs

TORCH_ACTS = {
    "linear": lambda x, a: x,
    "relu": lambda x, a: F.relu(x),
    "lrelu": lambda x, a: F.leaky_relu(x, a),
    "tanh": lambda x, a: torch.tanh(x),
    "sigmoid": lambda x, a: torch.sigmoid(x),
    "elu": lambda x, a: F.elu(x),
    "selu": lambda x, a: F.selu(x),
    "softplus": lambda x, a: F.softplus(x),
    "swish": lambda x, a: torch.sigmoid(x) * x,
}

DEF_GAINS = {"relu": np.sqrt(2), "lrelu": np.sqrt(2), "swish": np.sqrt(2)}


@pytest.mark.parametrize("act", sorted(activation_funcs))
def test_bias_act_parity(act, rng):
    x = rng.randn(4, 8, 5, 5).astype(np.float32) * 3
    b = rng.randn(8).astype(np.float32)
    got = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), act=act))

    xt = torch.as_tensor(x) + torch.as_tensor(b).reshape(1, -1, 1, 1)
    alpha = 0.2 if act == "lrelu" else 0.0
    want = TORCH_ACTS[act](xt, alpha) * DEF_GAINS.get(act, 1.0)
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-5, atol=2e-5)


def test_bias_act_gain_clamp(rng):
    x = rng.randn(2, 4).astype(np.float32) * 10
    got = np.asarray(bias_act(jnp.asarray(x), act="lrelu", gain=2.0, clamp=1.5))
    want = np.clip(np.where(x >= 0, x, 0.2 * x) * 2.0, -1.5, 1.5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bias_act_dim(rng):
    x = rng.randn(3, 4, 5).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    got = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), dim=2))
    np.testing.assert_allclose(got, x + b.reshape(1, 1, 5), rtol=1e-6)
