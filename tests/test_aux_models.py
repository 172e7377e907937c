"""Parity tests for auxiliary models vs their torch counterparts.

Strategy: instantiate the torch architecture with random init, port the
state_dict through the structural converter, compare forward outputs.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tgi.models.pose_resnet import (convert_torch_state_dict, resnet34_apply)
from tgi.models.vgg import convert_torch_features, warping_features, \
    vgg16_features

REF = "/root/reference"


def _to_np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_resnet34_parity(rng):
    """Against the reference's vendored torchvision-fork ResNet
    (scripts/resnet/resnet.py — torchvision itself is not in the image)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from scripts.resnet.resnet import resnet34
    torch.manual_seed(0)
    net = resnet34(pretrained=False, output_dims=6).eval()
    params = convert_torch_state_dict(_to_np_sd(net))
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = net(torch.as_tensor(x)).numpy()
    got = np.asarray(resnet34_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def _torch_vgg16_features():
    """VGG16 conv trunk built from torch primitives (torchvision layout)."""
    from torch import nn
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_c, v, 3, padding=1), nn.ReLU(True)]
            in_c = v
    return nn.Sequential(*layers)


def test_vgg16_warping_features_parity(rng):
    torch.manual_seed(1)
    net = _torch_vgg16_features().eval()
    sd = {f"features.{k}": v.detach().numpy()
          for k, v in net.state_dict().items()}
    params = convert_torch_features(sd)
    x = rng.rand(1, 3, 64, 64).astype(np.float32) * 255
    # get_features('14') textually returns the conv14 output, but the
    # inplace stage ReLU at index 15 mutates it before return — the
    # BEHAVIOR is net[:16] (through ReLU15). See warping_features.
    with torch.no_grad():
        want = net[:16](torch.as_tensor(x)).numpy()
    got = np.asarray(warping_features(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_arcface_parity(rng):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.facial_recognition.model_irse import Backbone
    from tgi.models.arcface import arcface_apply
    torch.manual_seed(2)
    net = Backbone(input_size=112, num_layers=50, mode="ir_se").eval()
    params = convert_torch_state_dict(_to_np_sd(net))
    x = rng.randn(1, 3, 112, 112).astype(np.float32)
    with torch.no_grad():
        want = net(torch.as_tensor(x)).numpy()
    got = np.asarray(arcface_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_e4e_parity(rng):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.e4e.encoders.psp_encoders import Encoder4Editing
    from tgi.models.e4e import e4e_apply, e4e_encode_w0
    torch.manual_seed(3)
    net = Encoder4Editing(50, "ir_se").eval()
    params = convert_torch_state_dict(_to_np_sd(net))
    x = rng.rand(1, 3, 256, 256).astype(np.float32) * 255
    with torch.no_grad():
        want = net(torch.as_tensor(x)).numpy()   # [1, 18, 512]
    got = np.asarray(e4e_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    w0 = np.asarray(e4e_encode_w0(params, jnp.asarray(x)))
    np.testing.assert_allclose(w0, want[:, 0], rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_psp_checkpoint_ingestion():
    """convert_psp_checkpoint accepts every published e4e artifact layout
    (psp.py:31-40 full dump; scripts/run_pti.py:33-49 DataParallel dump;
    bare encoder state_dict) and rejects wrong files loudly."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.e4e.encoders.psp_encoders import Encoder4Editing
    from tgi.models.e4e import convert_psp_checkpoint
    torch.manual_seed(5)
    net = Encoder4Editing(50, "ir_se").eval()
    enc_sd = _to_np_sd(net)
    avg = np.random.RandomState(0).randn(18, 512).astype(np.float32)

    # (a) official e4e full dump: state_dict with encoder./decoder.
    # prefixes + top-level latent_avg.
    full = {"state_dict": {f"encoder.{k}": v for k, v in enc_sd.items()},
            "latent_avg": avg, "opts": {"device": "cuda"}}
    full["state_dict"]["decoder.style.1.weight"] = np.zeros((512, 512),
                                                            np.float32)
    p_full, got_avg = convert_psp_checkpoint(full)
    np.testing.assert_array_equal(np.asarray(got_avg), avg)

    # (b) the reference's own initializer: DataParallel(pSp2) state_dict.
    dp = {f"module.encoder.{k}": v for k, v in enc_sd.items()}
    p_dp, avg_dp = convert_psp_checkpoint(dp)
    assert avg_dp is None

    # (c) bare Encoder4Editing.state_dict().
    p_bare, _ = convert_psp_checkpoint(dict(enc_sd))

    flat = lambda t: jax.tree_util.tree_leaves(t)
    for a, b in zip(flat(p_full), flat(p_dp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(flat(p_full), flat(p_bare)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Wrong checkpoint (a pose-resnet layout) must fail with a diff,
    # not mis-nest silently.
    with pytest.raises(ValueError, match="expected parameter layout"):
        convert_psp_checkpoint(
            {"conv1.weight": np.zeros((64, 3, 7, 7), np.float32)})
    # Truncated encoder dump (missing leaves) must fail too.
    broken = dict(enc_sd)
    for k in list(broken):
        if k.startswith("styles.9"):
            del broken[k]
    with pytest.raises(ValueError, match="missing"):
        convert_psp_checkpoint(broken)


def _torch_lpips_alex():
    """Minimal torch replica of ``lpips.LPIPS(net='alex')`` (the package is
    not in the image): torchvision-layout alexnet.features trunk, scaling
    layer, channel unit-norm, non-negative 1x1 lin heads, spatial average."""
    from torch import nn

    class LPIPSAlex(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(
                nn.Conv2d(3, 64, 11, stride=4, padding=2), nn.ReLU(True),
                nn.MaxPool2d(3, 2),
                nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(True),
                nn.MaxPool2d(3, 2),
                nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(True),
                nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(True),
                nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(True),
            )
            self.stages = (1, 4, 7, 9, 11)
            self.lins = nn.ModuleList(
                [nn.Conv2d(c, 1, 1, bias=False)
                 for c in (64, 192, 384, 256, 256)])
            for lin in self.lins:
                with torch.no_grad():
                    lin.weight.abs_()
            self.register_buffer(
                "shift", torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1))
            self.register_buffer(
                "scale", torch.tensor([.458, .448, .450]).view(1, 3, 1, 1))

        def embed(self, x):
            x = (x - self.shift) / self.scale
            acts = []
            for i, m in enumerate(self.features):
                x = m(x)
                if i in self.stages:
                    acts.append(x)
            return acts

        def forward(self, a, b):
            val = 0
            for fa, fb, lin in zip(self.embed(a), self.embed(b), self.lins):
                na = fa / (fa.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
                nb = fb / (fb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
                val = val + lin((na - nb) ** 2).mean(dim=(2, 3))
            return val.reshape(-1)

    return LPIPSAlex()


def test_alex_lpips_parity(rng):
    """convert_lpips_alex + alex_lpips_distance vs the torch formula
    (base_coach.py:48's LPIPS(net='alex'), lpips package forward)."""
    from tgi.models.alexnet import convert_lpips_alex, alex_lpips_distance
    torch.manual_seed(4)
    net = _torch_lpips_alex().eval()
    sd = {}
    # Emit the lpips-package key layout (net.slice{k}.{tv_idx} + lin{l}).
    slices = {1: (0, 1), 2: (2, 3, 4), 3: (5, 6, 7), 4: (8, 9), 5: (10, 11)}
    for k, idxs in slices.items():
        for i in idxs:
            m = net.features[i]
            if hasattr(m, "weight"):
                sd[f"net.slice{k}.{i}.weight"] = m.weight.detach().numpy()
                sd[f"net.slice{k}.{i}.bias"] = m.bias.detach().numpy()
    for l, lin in enumerate(net.lins):
        sd[f"lin{l}.model.1.weight"] = lin.weight.detach().numpy()
    trunk, head = convert_lpips_alex(sd)
    assert len(trunk["features"]) == 5 and len(head) == 5

    a = (rng.rand(2, 3, 128, 128).astype(np.float32) * 2 - 1)
    b = (rng.rand(2, 3, 128, 128).astype(np.float32) * 2 - 1)
    with torch.no_grad():
        want = net(torch.as_tensor(a), torch.as_tensor(b)).numpy()
    got = np.asarray(alex_lpips_distance(trunk, head, jnp.asarray(a),
                                         jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_alex_lpips_loss_interface():
    """AlexLPIPSLoss call forms agree with each other."""
    from tgi.losses.lpips import AlexLPIPSLoss, make_lpips
    lp = make_lpips("alex", key=jax.random.PRNGKey(7))
    assert isinstance(lp, AlexLPIPSLoss)
    a = jnp.linspace(-1, 1, 2 * 3 * 64 * 64).reshape(2, 3, 64, 64)
    b = -a
    d1 = lp.from_unit(a, b)
    d2 = lp((a + 1) * 127.5, (b + 1) * 127.5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)
    fa = lp.features((a + 1) * 127.5)
    fb = lp.features((b + 1) * 127.5)
    d3 = jnp.sum(jnp.square(fa - fb), axis=-1)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d3), rtol=1e-4,
                               atol=1e-6)
