"""End-to-end smoke tests of the TriPlaneGenerator forward on tiny configs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgi.models import TriPlaneGenerator, GeneratorConfig, \
    default_rendering_kwargs
from tgi.render.cameras import look_at_pose, fov_to_intrinsics, pack_camera


def tiny_config(**over):
    rk = default_rendering_kwargs(
        superresolution_module="SuperresolutionTiny",
        depth_resolution=6, depth_resolution_importance=6,
        ray_start=2.25, ray_end=3.3, box_warp=1.0,
        image_resolution=64)
    kw = dict(z_dim=32, c_dim=25, w_dim=32, img_resolution=64,
              backbone_resolution=32, plane_channels=8, mapping_layers=2,
              channel_base=512, channel_max=32,
              neural_rendering_resolution=16, rendering_kwargs=rk)
    kw.update(over)
    return GeneratorConfig(**kw)


@pytest.fixture(scope="module")
def tiny_gen():
    G = TriPlaneGenerator(tiny_config())
    params = G.init(jax.random.PRNGKey(0))
    return G, params


def camera_batch(n=1):
    cam = look_at_pose(np.pi / 2, np.pi / 2, jnp.asarray([0., 0., 0.2]),
                       radius=2.7)
    return pack_camera(jnp.tile(cam[None], (n, 1, 1)),
                       fov_to_intrinsics(18.837))


def test_forward_shapes(tiny_gen):
    G, params = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    c = camera_batch(2)
    out = G(params, z, c, det=True)
    assert out["image"].shape == (2, 3, 64, 64)
    assert out["image_raw"].shape == (2, 3, 16, 16)
    assert out["image_depth"].shape == (2, 1, 16, 16)
    assert out["planes"].shape == (2, 3, 8, 32, 32)
    for k in ("image", "image_raw", "image_depth"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    # Depth is inside the sampled range.
    d = np.asarray(out["image_depth"])
    assert (d >= 2.25 - 1e-3).all() and (d <= 3.3 + 1e-3).all()


def test_synthesis_jits_and_is_deterministic(tiny_gen):
    G, params = tiny_gen
    ws = jnp.zeros((1, G.cfg.num_ws, 32))
    c = camera_batch(1)

    @jax.jit
    def render(p, ws, c):
        return G.synthesis(p, ws, c, det=True)["image"]

    a = render(params, ws, c)
    b = render(params, ws, c)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mapping_truncation(tiny_gen):
    G, params = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 32))
    c = camera_batch(4)
    ws_full = G.mapping(params, z, c)
    ws_trunc = G.mapping(params, z, c, truncation_psi=0.0)
    assert ws_full.shape == (4, G.cfg.num_ws, 32)
    # psi=0 collapses to w_avg (zeros at init).
    np.testing.assert_allclose(np.asarray(ws_trunc), 0.0, atol=1e-6)


def test_gradients_flow_through_render(tiny_gen):
    G, params = tiny_gen
    c = camera_batch(1)
    ws = jnp.zeros((1, G.cfg.num_ws, 32))

    def loss(ws):
        out = G.synthesis(params, ws, c, det=True)
        return jnp.mean(out["image"] ** 2) + jnp.mean(out["image_raw"] ** 2)

    g = jax.grad(loss)(ws)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_sample_mixed_matches_render_geometry(tiny_gen):
    """sigma sampled through sample_mixed is finite and shaped [N, M, 1]."""
    G, params = tiny_gen
    ws = jnp.zeros((1, G.cfg.num_ws, 32))
    coords = jax.random.uniform(jax.random.PRNGKey(3), (1, 100, 3),
                                minval=-0.4, maxval=0.4)
    out = G.sample_mixed(params, coords, ws)
    assert out["sigma"].shape == (1, 100, 1)
    assert out["rgb"].shape == (1, 100, 8)
    assert np.isfinite(np.asarray(out["sigma"])).all()


def test_cached_planes_short_circuit(tiny_gen):
    G, params = tiny_gen
    ws = jnp.zeros((1, G.cfg.num_ws, 32))
    c = camera_batch(1)
    out1 = G.synthesis(params, ws, c, det=True)
    out2 = G.synthesis(params, ws, c, det=True, planes=out1["planes"])
    np.testing.assert_allclose(np.asarray(out1["image"]),
                               np.asarray(out2["image"]), atol=1e-6)


def test_sr_max_res_early_exit():
    """superresolution_apply(max_res=...) exits the pyramid at each of its
    three levels (the canon_sr_max_res fast path — PERF.md):
    max_res<=input_resolution returns the bilinear-lifted raw rgb (the
    flagship's canon128), max_res=block0 res returns exactly block0's
    accumulated rgb skip (canon256), and max_res at/above the final
    resolution is a no-op vs the full pyramid. Uses a config whose three
    resolutions are distinct (16 -> 32 -> 64) — the flagship 8X shape
    (128 -> 256 -> 512) scaled down."""
    from tgi.nn.superres import (SRConfig, bilinear_resize,
                                 superresolution_apply,
                                 superresolution_init)
    from tgi.nn.synthesis import synthesis_block_apply

    cfg = SRConfig("SRTest3Level", 16, (8, 16, 32, 2), (16, 16, 64, 2), 64)
    params = superresolution_init(jax.random.PRNGKey(0), cfg, w_dim=32)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    rgb = jax.random.normal(k1, (1, 3, 8, 8)) * 0.1
    x = jax.random.normal(k2, (1, cfg.block0[0], 8, 8)) * 0.1
    ws = jax.random.normal(k3, (1, 5, 32))
    kw = dict(noise_mode="const", use_fp16=False)

    # Level-0 exit: the raw render bilinear-lifted to input_resolution.
    lvl0 = superresolution_apply(params, rgb, x, ws, cfg,
                                 max_res=cfg.input_resolution, **kw)
    want0 = bilinear_resize(rgb, cfg.input_resolution, antialias=True)
    np.testing.assert_array_equal(np.asarray(lvl0), np.asarray(want0))

    # Block-0 exit: manual block0-only composition matches bit-for-bit.
    res0 = cfg.block0[2]
    early = superresolution_apply(params, rgb, x, ws, cfg, max_res=res0,
                                  **kw)
    assert early.shape == (1, 3, res0, res0)
    ws3 = jnp.tile(ws[:, -1:, :], (1, 3, 1))
    xr = bilinear_resize(x, cfg.input_resolution, antialias=True)
    rgbr = bilinear_resize(rgb, cfg.input_resolution, antialias=True)
    _, want = synthesis_block_apply(
        params["block0"], xr, rgbr, ws3, in_channels=cfg.block0[0],
        resolution=res0, up=cfg.block0[3], use_fp16=False,
        force_fp32=False, conv_clamp=None, noise_mode="const",
        noise_key=None, fused_dtype="bfloat16")
    np.testing.assert_array_equal(np.asarray(early), np.asarray(want))

    full = superresolution_apply(params, rgb, x, ws, cfg, **kw)
    capped = superresolution_apply(params, rgb, x, ws, cfg,
                                   max_res=cfg.img_resolution, **kw)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(capped))


def test_synthesis_sr_max_res(tiny_gen):
    """G.synthesis(sr_max_res=...) plumbs through to the SR pyramid: the
    'image' output comes back at the truncated resolution, everything
    else (raw render, depth) is untouched."""
    G, params = tiny_gen
    ws = jnp.zeros((1, G.cfg.num_ws, 32))
    c = camera_batch(1)
    res0 = G.cfg.sr_cfg.block0[2]
    out = G.synthesis(params, ws, c, det=True, sr_max_res=res0)
    full = G.synthesis(params, ws, c, det=True)
    assert out["image"].shape == (1, 3, res0, res0)
    np.testing.assert_array_equal(np.asarray(out["image_raw"]),
                                  np.asarray(full["image_raw"]))
    np.testing.assert_array_equal(np.asarray(out["image_depth"]),
                                  np.asarray(full["image_depth"]))
