"""Parity tests for auxiliary models vs their torch counterparts.

Strategy: instantiate the torch architecture with random init, port the
state_dict through the structural converter, compare forward outputs.
"""

import os
import sys

import numpy as np
import pytest
import torch

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
    with torch.no_grad():
        want = net[:16](torch.as_tensor(x)).numpy()  # through ReLU idx 15
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
