"""SG3 alias-free generator smoke tests (small config)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tgi.nn.synthesis3 import SG3Config, SG3Generator, design_lowpass_filter


def test_lowpass_filter_design():
    f = design_lowpass_filter(12, cutoff=2.0, width=2.0, fs=16)
    assert f.shape == (12,)
    np.testing.assert_allclose(f.sum(), 1.0, rtol=1e-5)
    fr = design_lowpass_filter(12, cutoff=2.0, width=2.0, fs=16, radial=True)
    assert fr.shape == (12, 12)
    np.testing.assert_allclose(fr.sum(), 1.0, rtol=1e-4)
    assert design_lowpass_filter(1, 2.0, 2.0, 16) is None


@pytest.fixture(scope="module")
def sg3():
    cfg = SG3Config(z_dim=16, w_dim=16, img_resolution=32, channel_base=1024,
                    channel_max=16, num_layers=6, margin_size=4,
                    num_fp16_res=0)
    G = SG3Generator(cfg)
    params = G.init(jax.random.PRNGKey(0))
    return G, params


def test_sg3_forward_shape(sg3):
    G, params = sg3
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    img = G(params, z, None)
    assert img.shape == (2, 3, 32, 32)
    assert np.isfinite(np.asarray(img)).all()


def test_sg3_layer_specs_progression(sg3):
    G, _ = sg3
    _, specs = G.cfg.layer_specs()
    # Cutoffs grow monotonically to img_resolution / 2.
    cutoffs = [s.out_cutoff for s in specs]
    assert all(b >= a - 1e-6 for a, b in zip(cutoffs, cutoffs[1:]))
    assert abs(cutoffs[-1] - G.cfg.img_resolution / 2) < 1e-6
    # Last two layers sized at the output resolution (critical sampling).
    assert specs[-1].out_size == 32 and specs[-2].out_size == 32
    assert specs[-1].is_torgb and specs[-1].out_channels == 3


def test_sg3_jit_and_grad(sg3):
    G, params = sg3
    z = jnp.zeros((1, 16))

    @jax.jit
    def loss(params, z):
        return jnp.mean(G(params, z, None) ** 2)

    g = jax.grad(loss)(params, z)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0
