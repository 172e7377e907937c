"""Parity tests for tgi.ops.upfirdn2d against torch-built goldens.

The golden is an independent torch composition of the documented op
semantics (zero-insert upsample, pad/crop, FIR convolve, decimate) using
only torch builtins.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tgi.ops import setup_filter, upfirdn2d, upsample2d, downsample2d, filter2d


def torch_upfirdn2d(x, f, up, down, padding, flip_filter=False, gain=1.0):
    """Golden: direct torch realization of the upfirdn2d spec."""
    x = torch.as_tensor(x)
    if f is None:
        f = np.ones((1, 1), dtype=np.float32)
    f = torch.as_tensor(np.asarray(f, np.float32))
    if f.ndim == 1:
        f = torch.outer(f, f) / 1.0 if False else f
    upx = upy = up if isinstance(up, int) else None
    if upx is None:
        upx, upy = up
    downx = downy = down if isinstance(down, int) else None
    if downx is None:
        downx, downy = down
    if isinstance(padding, int):
        padding = [padding] * 4
    elif len(padding) == 2:
        padding = [padding[0], padding[0], padding[1], padding[1]]
    padx0, padx1, pady0, pady1 = padding

    N, C, H, W = x.shape
    # zero-insert upsample
    x = x.reshape(N, C, H, 1, W, 1)
    x = F.pad(x, [0, upx - 1, 0, 0, 0, upy - 1])
    x = x.reshape(N, C, H * upy, W * upx)
    # pad / crop
    x = F.pad(x, [max(padx0, 0), max(padx1, 0), max(pady0, 0), max(pady1, 0)])
    x = x[:, :, max(-pady0, 0): x.shape[2] - max(-pady1, 0),
          max(-padx0, 0): x.shape[3] - max(-padx1, 0)]
    # filter
    f = f * (gain ** (f.ndim / 2))
    f = f.to(x.dtype)
    if not flip_filter:
        f = f.flip(list(range(f.ndim)))
    if f.ndim == 2:
        fk = f[None, None].repeat(C, 1, 1, 1)
        x = F.conv2d(x, fk, groups=C)
    else:
        fk = f[None, None].repeat(C, 1, 1)
        x = F.conv2d(x, fk.unsqueeze(2), groups=C)
        x = F.conv2d(x, fk.unsqueeze(3), groups=C)
    return x[:, :, ::downy, ::downx].numpy()


CASES = [
    dict(up=1, down=1, padding=0, f=[1, 3, 3, 1]),
    dict(up=2, down=1, padding=2, f=[1, 3, 3, 1]),
    dict(up=1, down=2, padding=1, f=[1, 3, 3, 1]),
    dict(up=2, down=2, padding=[1, 2, 0, 3], f=[1, 3, 3, 1]),
    dict(up=1, down=1, padding=[-1, 2], f=[1, 2, 1]),
    dict(up=(2, 1), down=(1, 2), padding=2, f=[1, 3, 3, 1]),
    dict(up=1, down=1, padding=1, f=None),
    dict(up=4, down=1, padding=4, f=[1, 3, 3, 1]),
    # separable (>= 8 taps stays 1D)
    dict(up=2, down=1, padding=4, f=[1, 2, 3, 4, 4, 3, 2, 1]),
]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("flip_filter", [False, True])
def test_upfirdn2d_parity(case, flip_filter, rng):
    x = rng.randn(2, 3, 8, 9).astype(np.float32)
    f = setup_filter(case["f"]) if case["f"] is not None else None
    got = np.asarray(upfirdn2d(jnp.asarray(x), f, up=case["up"],
                               down=case["down"], padding=case["padding"],
                               flip_filter=flip_filter, gain=1.5))
    want = torch_upfirdn2d(x, f, case["up"], case["down"], case["padding"],
                           flip_filter=flip_filter, gain=1.5)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_gradient(rng):
    """Gradients flow and match numerical finite differences."""
    x = rng.randn(1, 2, 6, 6).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])

    def loss(xj):
        return jnp.sum(upfirdn2d(xj, f, up=2, down=1, padding=2) ** 2)

    g = jax.grad(loss)(jnp.asarray(x))
    eps = 1e-3
    i = (0, 1, 3, 2)
    xp = x.copy(); xp[i] += eps
    xm = x.copy(); xm[i] -= eps
    num = (loss(jnp.asarray(xp)) - loss(jnp.asarray(xm))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g)[i], float(num), rtol=1e-2)


def test_upsample_downsample_roundtrip(rng):
    # Band-limited (smooth) input: up -> down with a lowpass filter is
    # near-identity away from the borders.
    g = np.linspace(0, 2 * np.pi, 16, dtype=np.float32)
    x = np.sin(g)[None, None, :, None] * np.cos(g)[None, None, None, :]
    x = np.tile(x, (1, 4, 1, 1)).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    up = upsample2d(jnp.asarray(x), f)
    assert up.shape == (1, 4, 32, 32)
    down = downsample2d(up, f)
    assert down.shape == (1, 4, 16, 16)
    # Smooth filter round trip should be close to identity in the interior.
    got = np.asarray(down)[..., 4:-4, 4:-4]
    np.testing.assert_allclose(got, x[..., 4:-4, 4:-4], atol=0.35)


def test_filter2d_shape(rng):
    x = rng.randn(1, 2, 10, 10).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    y = filter2d(jnp.asarray(x), f)
    assert y.shape == x.shape


def test_constant_preserved():
    """DC response: normalized filter keeps a constant signal constant."""
    x = jnp.ones((1, 1, 12, 12))
    f = setup_filter([1, 3, 3, 1])
    y = filter2d(x, f)
    np.testing.assert_allclose(np.asarray(y)[..., 3:-3, 3:-3], 1.0, rtol=1e-6)
