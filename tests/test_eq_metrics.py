"""Equivariance-metric operator golden parity vs metrics/equivariance.py.

The EQ-T/EQ-T_frac/EQ-R numbers are only comparable to published values
if the transform operators (masked integer translation, windowed-sinc
fractional translation, FFT-constructed oriented bandlimit filters,
affine resampling, pseudo-rotation) match the reference's NUMERICS —
each is compared here against the reference function directly on CPU
torch. The harness itself is smoke-tested on a tiny random SG3 (alias-
free by construction, so PSNRs must come out high and finite).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tgi.metrics.equivariance import (apply_affine_transformation,
                                      apply_fractional_pseudo_rotation,
                                      apply_fractional_rotation,
                                      apply_fractional_translation,
                                      apply_integer_translation,
                                      construct_affine_bandlimit_filter,
                                      rotation_matrix)

REF = "/root/reference"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference not mounted")


def _ref_mod():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from metrics import equivariance as ref_eq
    return ref_eq


@needs_ref
@pytest.mark.parametrize("t", [(0.1, -0.05), (-0.125, 0.125), (0.0, 0.07)])
def test_integer_translation_golden(rng, t):
    import torch
    ref_eq = _ref_mod()
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        zr, mr = ref_eq.apply_integer_translation(torch.as_tensor(x),
                                                  t[0], t[1])
    z, m = apply_integer_translation(jnp.asarray(x), t[0], t[1])
    np.testing.assert_array_equal(np.asarray(z), zr.numpy())
    np.testing.assert_array_equal(np.asarray(m), mr.numpy())


@needs_ref
@pytest.mark.parametrize("t", [(0.987 / 32, -0.05), (-0.11, 0.0401)])
def test_fractional_translation_golden(rng, t):
    import torch
    ref_eq = _ref_mod()
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        zr, mr = ref_eq.apply_fractional_translation(torch.as_tensor(x),
                                                     t[0], t[1])
    z, m = apply_fractional_translation(jnp.asarray(x), t[0], t[1])
    np.testing.assert_allclose(np.asarray(z), zr.numpy(), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m), mr.numpy())


@needs_ref
@pytest.mark.parametrize("angle", [0.3, -1.2])
def test_bandlimit_filter_golden(angle):
    import torch
    ref_eq = _ref_mod()
    mat = rotation_matrix(angle)
    with torch.no_grad():
        fr = ref_eq.construct_affine_bandlimit_filter(
            torch.as_tensor(mat), a=3, amax=6, up=4).numpy()
    f = construct_affine_bandlimit_filter(mat, a=3, amax=6, up=4)
    np.testing.assert_allclose(f, fr, atol=1e-6)


@needs_ref
@pytest.mark.parametrize("angle", [0.4, -0.9])
def test_rotation_operators_golden(rng, angle):
    import torch
    ref_eq = _ref_mod()
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        zr, mr = ref_eq.apply_fractional_rotation(torch.as_tensor(x), angle)
        pr_, pmr = ref_eq.apply_fractional_pseudo_rotation(
            torch.as_tensor(x), angle)
    z, m = apply_fractional_rotation(jnp.asarray(x), angle)
    p, pm = apply_fractional_pseudo_rotation(jnp.asarray(x), angle)
    np.testing.assert_allclose(np.asarray(z), zr.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(m), mr.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p), pr_.numpy(), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pm), pmr.numpy())


def test_eq_harness_on_sg3():
    """Full harness on a tiny random SG3: PSNRs finite, and high (the
    architecture is equivariant by construction)."""
    from tgi.metrics.equivariance import compute_equivariance_metrics
    from tgi.nn.synthesis3 import SG3Config, SG3Generator
    cfg = SG3Config(z_dim=16, w_dim=16, img_resolution=32,
                    channel_base=1024, channel_max=16, num_layers=6,
                    margin_size=4, num_fp16_res=0)
    G = SG3Generator(cfg)
    params = G.init(jax.random.PRNGKey(0))
    out = compute_equivariance_metrics(G, params, num_samples=8,
                                       batch_size=4, eqt_int=True,
                                       eqt_frac=True, eqr=True)
    assert set(out) == {"eqt_int", "eqt_frac", "eqr"}
    for k, v in out.items():
        assert np.isfinite(v) and v > 15, (k, v)
