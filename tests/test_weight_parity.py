"""Weight-port parity: reference PyTorch EG3D vs tgi, stage by stage.

The strongest correctness test in the suite (SURVEY.md section 4c): build
the *reference* TriPlaneGenerator on CPU (its CUDA ops auto-fall back to
the pure-torch 'ref' paths), pickle it with its own persistence machinery,
import that pickle with tgi's code-free unpickler, and compare mapping /
backbone / full-render outputs numerically. Stochastic sampling is made
deterministic on both sides (no stratified jitter; linspace inverse-CDF
draws).

Requires /root/reference; skipped elsewhere.
"""

import os
import pickle
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

RENDERING_KWARGS = dict(
    image_resolution=128, disparity_space_sampling=False,
    clamp_mode="softplus",
    superresolution_module="training.superresolution.SuperresolutionHybrid2X",
    c_gen_conditioning_zero=False, c_scale=1.0,
    superresolution_noise_mode="none", density_reg=0.25,
    density_reg_p_dist=0.004, reg_type="l1", decoder_lr_mul=1.0,
    sr_antialias=True, depth_resolution=8, depth_resolution_importance=8,
    ray_start=2.25, ray_end=3.3, box_warp=1.0, avg_camera_radius=2.7,
    avg_camera_pivot=[0, 0, 0.2], white_back=False, density_noise=0)

CAMERA = [1, 0, 0, 0, 0, -1, 0, 0, 0, 0, -1, 2.7, 0, 0, 0, 1,
          4.2647, 0, 0.5, 0, 4.2647, 0.5, 0, 0, 1]


@pytest.fixture(scope="module")
def reference_setup():
    import torch
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.manual_seed(0)
    torch.Tensor.cuda = lambda self, *a, **k: self  # ray_sampler.py:38
    from training.triplane import TriPlaneGenerator as RefG

    G = RefG(512, 25, 512, 128, 3, sr_num_fp16_res=0,
             mapping_kwargs={"num_layers": 2},
             rendering_kwargs=dict(RENDERING_KWARGS), sr_kwargs={},
             channel_base=2048, channel_max=64, num_fp16_res=0,
             conv_clamp=None)
    G.eval()
    blob = pickle.dumps({"G_ema": G})

    # Deterministic sampling on the torch side.
    def det_rand(*size, **kw):
        if len(size) == 1 and isinstance(size[0], (tuple, list)):
            size = tuple(size[0])
        u = torch.linspace(0, 1, size[-1], device=kw.get("device"))
        return u.expand(*size)

    orig = (torch.rand, torch.rand_like)
    torch.rand = det_rand
    torch.rand_like = lambda t: torch.zeros_like(t)

    z = torch.randn(1, 512)
    cam = torch.tensor([CAMERA], dtype=torch.float32)
    with torch.no_grad():
        ws = G.mapping(z, cam)
        planes = G.backbone.synthesis(ws, noise_mode="const")
        out = G(z, cam, noise_mode="const", neural_rendering_resolution=16)
    torch.rand, torch.rand_like = orig

    return {
        "blob": blob,
        "z": z.numpy(), "cam": cam.numpy(), "ws": ws.numpy(),
        "planes": planes.numpy(),
        "image": out["image"].numpy(), "raw": out["image_raw"].numpy(),
        "depth": out["image_depth"].numpy(),
    }


@pytest.fixture(scope="module")
def converted(reference_setup):
    from tgi.io import load_network_pkl, captured_state_dict, \
        convert_generator_params, generator_config_from_captured
    from tgi.models import TriPlaneGenerator

    data = load_network_pkl(reference_setup["blob"])
    cap = data["G_ema"]
    cfg = generator_config_from_captured(cap)
    sd = captured_state_dict(cap)
    params = convert_generator_params(sd)
    return TriPlaneGenerator(cfg), params, sd


def test_config_extracted(converted):
    G, params, sd = converted
    assert G.cfg.z_dim == 512 and G.cfg.w_dim == 512
    assert G.cfg.img_resolution == 128
    assert G.cfg.channel_base == 2048 and G.cfg.channel_max == 64
    assert G.cfg.mapping_layers == 2
    assert G.cfg.rendering_kwargs["depth_resolution"] == 8
    assert G.cfg.sr_cfg.name == "SuperresolutionHybrid2X"


def test_all_reference_tensors_consumed(converted):
    """Every reference parameter lands in the tgi tree (no silent drops)."""
    G, params, sd = converted
    import jax
    flat = jax.tree_util.tree_leaves(params)
    n_expected = sum(1 for k in sd if not k.endswith("resample_filter"))
    assert len(flat) == n_expected, (len(flat), n_expected)


def test_mapping_parity(reference_setup, converted):
    G, params, _ = converted
    ws = G.mapping(params, jnp.asarray(reference_setup["z"]),
                   jnp.asarray(reference_setup["cam"]))
    np.testing.assert_allclose(np.asarray(ws), reference_setup["ws"],
                               rtol=1e-4, atol=1e-5)


def test_backbone_planes_parity(reference_setup, converted):
    G, params, _ = converted
    ws = jnp.asarray(reference_setup["ws"])
    planes = G.backbone_planes(params, ws, noise_mode="const")
    planes = np.asarray(planes).reshape(reference_setup["planes"].shape)
    ref = reference_setup["planes"]
    np.testing.assert_allclose(planes, ref, rtol=1e-3, atol=2e-4)


def test_full_synthesis_parity(reference_setup, converted):
    G, params, _ = converted
    out = G.synthesis(params, jnp.asarray(reference_setup["ws"]),
                      jnp.asarray(reference_setup["cam"]),
                      neural_rendering_resolution=16, noise_mode="const",
                      det=True)
    np.testing.assert_allclose(np.asarray(out["image_raw"]),
                               reference_setup["raw"], atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["image_depth"]),
                               reference_setup["depth"], atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["image"]),
                               reference_setup["image"], atol=5e-3)


@pytest.mark.parametrize("variant", [
    "SuperresolutionHybrid8X", "SuperresolutionHybrid8XDC",
    "SuperresolutionHybrid4X", "SuperresolutionHybrid2X",
    "SuperresolutionHybridDeepfp32"])
def test_superres_variant_parity(variant):
    """Every SR_VARIANTS entry vs the reference module with ported weights
    (superresolution.py:29-291) — incl. the flagship 8XDC 512-path and the
    SynthesisBlockNoUp wiring (4X/2X/Deepfp32)."""
    import torch
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import training.superresolution as ref_sr
    from tgi.io.pickle_import import _nest
    from tgi.nn.superres import SR_VARIANTS, superresolution_apply

    torch.manual_seed(5)
    RefCls = getattr(ref_sr, variant)
    cfg = SR_VARIANTS[variant]
    kw = {} if variant == "SuperresolutionHybridDeepfp32" \
        else {"sr_antialias": False}  # Deepfp32 has no antialias arg
    net = RefCls(channels=32, img_resolution=cfg.img_resolution,
                 sr_num_fp16_res=0, **kw).eval()

    params = {}
    for name, t in net.state_dict().items():
        if name.endswith("resample_filter"):
            continue
        _nest(params, name.split("."), jnp.asarray(t.detach().numpy()))

    rng = np.random.RandomState(3)
    r = 64
    rgb = rng.randn(1, 3, r, r).astype(np.float32) * 0.1
    x = rng.randn(1, 32, r, r).astype(np.float32) * 0.1
    ws = rng.randn(1, 3, 512).astype(np.float32)
    with torch.no_grad():
        # .copy(): SynthesisBlockNoUp accumulates img via in-place add_
        # (superresolution.py:252), which would mutate the shared buffers.
        want = net(torch.as_tensor(rgb.copy()), torch.as_tensor(x.copy()),
                   torch.as_tensor(ws), noise_mode="const").numpy()
    got = np.asarray(superresolution_apply(
        params, jnp.asarray(rgb), jnp.asarray(x), jnp.asarray(ws), cfg,
        use_fp16=False, sr_antialias=False, noise_mode="const"))
    assert got.shape == want.shape == \
        (1, 3, cfg.img_resolution, cfg.img_resolution)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)
