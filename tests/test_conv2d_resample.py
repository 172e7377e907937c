"""Parity tests for tgi.ops.conv2d_resample against torch convolutions."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tgi.ops import setup_filter, conv2d_resample
from tests.test_upfirdn2d import torch_upfirdn2d


def torch_conv2d_resample(x, w, f, up, down, padding, groups=1,
                          flip_weight=True, flip_filter=False):
    """Golden: generic upfirdn->conv->downsample composition in torch."""
    x = torch.as_tensor(x)
    w = torch.as_tensor(w)
    out_c, in_per_group, kh, kw = w.shape
    fw, fh = (f.shape[-1], f.shape[0]) if f is not None else (1, 1)
    if isinstance(padding, int):
        padding = [padding] * 4
    px0, px1, py0, py1 = padding
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2
    x = torch.as_tensor(torch_upfirdn2d(
        x.numpy(), f if up > 1 else None, up, 1, [px0, px1, py0, py1],
        flip_filter=flip_filter, gain=up ** 2))
    if not flip_weight and (kw > 1 or kh > 1):
        w = w.flip([2, 3])
    x = F.conv2d(x, w, groups=groups)
    if down > 1:
        x = torch.as_tensor(torch_upfirdn2d(x.numpy(), f, 1, down, 0,
                                            flip_filter=flip_filter))
    return x.numpy()


CASES = [
    dict(up=1, down=1, padding=1, k=3),
    dict(up=1, down=1, padding=0, k=1),
    dict(up=2, down=1, padding=1, k=3),       # transpose-conv fast path
    dict(up=1, down=2, padding=1, k=3),       # strided-conv fast path
    dict(up=2, down=1, padding=0, k=1),       # 1x1 + upsample
    dict(up=1, down=2, padding=0, k=1),       # 1x1 + downsample
    dict(up=2, down=2, padding=1, k=3),
]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("flip_weight", [True, False])
def test_conv2d_resample_parity(case, flip_weight, rng):
    k = case["k"]
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    w = rng.randn(6, 4, k, k).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    got = np.asarray(conv2d_resample(
        jnp.asarray(x), jnp.asarray(w), f, up=case["up"], down=case["down"],
        padding=case["padding"], flip_weight=flip_weight))
    want = torch_conv2d_resample(x, w, f, case["up"], case["down"],
                                 [case["padding"]] * 4,
                                 flip_weight=flip_weight)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_conv2d_resample_groups(rng):
    x = rng.randn(1, 8, 6, 6).astype(np.float32)
    w = rng.randn(8, 2, 3, 3).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    got = np.asarray(conv2d_resample(jnp.asarray(x), jnp.asarray(w), f,
                                     up=2, padding=1, groups=4))
    want = torch_conv2d_resample(x, w, f, 2, 1, [1, 1, 1, 1], groups=4)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
