"""Stage-1 projector STEP golden parity vs the reference loop.

The strongest inversion test: run the reference's actual optimization
step machinery (w_projector.py:145-270 — camera assembly from the quat
pose net, lr/noise schedules, three Adam streams, warp loss via the
reference's own ``calc_warping_loss``/``RaySampler``, verbatim noise
regularization pyramid and per-step noise renormalization) on the
reference torch generator, and compare per-step loss components plus the
final (w, camera) trajectory against ``Projector``'s scanned step with
ported weights and identical initial state.

RNG-free construction: exploration noise is disabled
(initial_noise_factor=0, the only stochastic term in the step), the
noise buffers / start w are ported values, and the feature nets are one
shared random VGG16 + head used for both the warp features and the
LPIPS embedding on both sides.

Requires /root/reference; skipped elsewhere.
"""

import math
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

N_PRE, N_JOINT = 2, 3
LPIPS_STAGES = (3, 8, 15, 22, 29)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _torch_lpips_embed(net, head_ws, img_255):
    """Torch twin of tgi.models.vgg.lpips_features (the NVIDIA metric-VGG
    LPIPS embedding formula) sharing `net`'s conv weights."""
    import torch
    x = img_255 / 255.0
    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    x = (x - mean) / std
    feats = []
    k = 0
    for i in range(max(LPIPS_STAGES) + 1):
        x = net[i](x)
        if i in LPIPS_STAGES:
            a = x * torch.rsqrt((x ** 2).sum(1, keepdim=True) + 1e-10)
            w = torch.as_tensor(head_ws[k])
            a = a * torch.sqrt(torch.clamp(w, min=0)).view(1, -1, 1, 1)
            hw = a.shape[2] * a.shape[3]
            feats.append((a / math.sqrt(hw)).reshape(a.shape[0], -1))
            k += 1
    return torch.cat(feats, dim=-1)


@pytest.fixture(scope="module")
def setup():
    import torch
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.manual_seed(7)
    from scripts.resnet.resnet import resnet34
    from training.triplane import TriPlaneGenerator as RefG
    from tests.test_aux_models import _torch_vgg16_features

    G = RefG(512, 25, 512, 128, 3, sr_num_fp16_res=0,
             mapping_kwargs={"num_layers": 2},
             rendering_kwargs=dict(RENDERING_KWARGS), sr_kwargs={},
             channel_base=2048, channel_max=64, num_fp16_res=0,
             conv_clamp=None)
    G.eval().requires_grad_(False)
    blob = pickle.dumps({"G_ema": G})

    cam_net = resnet34(pretrained=False, output_dims=4).eval()
    vgg = _torch_vgg16_features().eval()
    for p in vgg.parameters():
        p.requires_grad_(False)
    head_ws = [np.abs(np.random.RandomState(3).randn(c).astype(np.float32))
               * 0.1 for c in (64, 128, 256, 512, 512)]

    # Target: an off-pose render from the reference G itself, 128².
    from utils.camera_utils import euler2rot
    with torch.no_grad():
        ext = euler2rot(torch.tensor([math.pi / 2 + 0.3]),
                        torch.tensor([math.pi / 2 - 0.1]),
                        torch.zeros(1, 1), batch_size=1)
        intr = torch.tensor([[4.2647, 0, 0.5, 0, 4.2647, 0.5, 0, 0, 1.0]])
        cam = torch.cat([ext, intr], dim=-1)
        z = torch.randn(1, 512)
        tgt = G(z, cam, noise_mode="const")["image"].clamp(-1, 1)[0]

    # Ported start-w and noise-buffer values.
    with torch.no_grad():
        w0 = torch.randn(1, 1, 512) * 0.1
    noise_vals = {}
    for name, buf in G.backbone.synthesis.named_buffers():
        if "noise_const" in name:
            noise_vals["backbone/" + name.replace(".", "/")] = \
                torch.randn_like(buf)
    for name, buf in G.superresolution.named_buffers():
        if "noise_const" in name:
            noise_vals["superresolution/" + name.replace(".", "/")] = \
                torch.randn_like(buf)

    return dict(G=G, blob=blob, cam_net=cam_net, vgg=vgg, head_ws=head_ws,
                target=tgt, w0=w0, noise_vals=noise_vals)


def _run_torch_loop(s):
    """The reference step loop (w_projector.py:145-270), quat mode,
    initial_noise_factor=0, on the shared nets; returns trajectories."""
    import copy

    import torch
    from configs import hyperparameters
    from training.volumetric_rendering.ray_sampler import RaySampler
    from training.warping_loss import calc_warping_loss
    from utils.camera_utils import compute_rotation_matrix_from_quaternion

    G = s["G"]
    # CPU-only autograd fix: triplane.py:86-88 passes rgb_image (a VIEW
    # of feature_image) into the SR module, whose torgb does img.add_ —
    # bumping the version of the conv-saved feature_image. On CUDA the
    # gradfix conv skips saving inputs for the frozen G so the inplace
    # op goes unnoticed; plain F.conv2d on CPU version-checks and
    # raises. Cloning the SR inputs breaks the aliasing with identical
    # numerics for the outputs the loss consumes.
    import torch as _t

    class _SRWrap(_t.nn.Module):
        def __init__(self, sr):
            super().__init__()
            self.sr = sr

        def forward(self, rgb, x, ws, **kw):
            return self.sr(rgb.clone(), x.clone(), ws, **kw)

    orig_sr = G.superresolution
    G.superresolution = _SRWrap(orig_sr)
    num_ws = G.backbone.num_ws
    cam_predictor = copy.deepcopy(s["cam_net"])
    target = s["target"]                              # [3, 128, 128] [-1,1]
    radius = 2.7
    init_ext = torch.Tensor([1, 0, 0, 0, 0, -1, 0, 0, 0, 0, -1, 2.7,
                             0, 0, 0, 1]).reshape(-1, 4, 4)
    intrinsic = torch.tensor([[4.2647, 0, 0.5, 0, 4.2647, 0.5, 0, 0, 1.0]])
    canonical_cam = torch.cat([init_ext.reshape(-1, 16), intrinsic], dim=-1)
    ray_generator = RaySampler()

    target_images = (((target + 1) / 2) * 255).unsqueeze(0).float()
    target_images_contiguous = target.contiguous()
    target_features = _torch_lpips_embed(s["vgg"], s["head_ws"],
                                         target_images)

    w_opt = s["w0"].clone().requires_grad_(True)
    translation_opt = torch.zeros(1, 3, requires_grad=True)
    noise_bufs = {n: b for n, b in G.backbone.synthesis.named_buffers()
                  if "noise_const" in n}
    noise_bufs2 = {n: b for n, b in orig_sr.named_buffers()
                  if "noise_const" in n}
    with torch.no_grad():
        for n, b in noise_bufs.items():
            b[:] = s["noise_vals"]["backbone/" + n.replace(".", "/")]
            b.requires_grad = True
        for n, b in noise_bufs2.items():
            b[:] = s["noise_vals"]["superresolution/"
                                   + n.replace(".", "/")]
            b.requires_grad = True

    optimizer = torch.optim.Adam(
        [w_opt] + list(noise_bufs.values()) + list(noise_bufs2.values()),
        betas=(0.9, 0.999), lr=hyperparameters.first_inv_lr)
    cam_optimizer = torch.optim.Adam(cam_predictor.parameters(),
                                     lr=hyperparameters.cam_lr_quat,
                                     betas=(0.9, 0.999))
    translation_optimizer = torch.optim.Adam(
        [translation_opt], lr=hyperparameters.translation_lr)

    num_steps = N_PRE + N_JOINT
    P = N_PRE
    log = {"dist": [], "warp": []}
    for step in range(num_steps):
        pred_quat = cam_predictor(target_images)
        pred_rotmat = compute_rotation_matrix_from_quaternion(pred_quat)

        pred_ext_tmp = torch.eye(4).unsqueeze(0).repeat(
            pred_rotmat.shape[0], 1, 1)
        pred_translation = -radius * pred_rotmat[:, :3, 2]
        pred_ext_tmp[:, :3, :3] = pred_rotmat
        translation_opt_world = -torch.bmm(
            pred_ext_tmp[:, :3, :3], translation_opt.unsqueeze(-1)) * 2.7
        tmp_translation = translation_opt_world.squeeze(-1) \
            + pred_translation
        tmp_translation = tmp_translation \
            / torch.norm(tmp_translation, dim=-1) * 2.7

        pred_ext = torch.eye(4).unsqueeze(0)
        pred_ext[:, :3, 3] = tmp_translation
        pred_ext[:, :3, :3] = pred_ext_tmp[:, :3, :3]
        pred_cam = torch.cat([pred_ext.reshape(-1, 16), intrinsic], dim=-1)

        t = (step - P) / (num_steps - P)
        lr_ramp = min(1.0, (1.0 - t) / 0.25)
        lr_ramp = 0.5 - 0.5 * np.cos(lr_ramp * np.pi)
        lr_ramp = lr_ramp * min(1.0, t / 0.05)
        lr = 8e-3 * lr_ramp
        for pg in optimizer.param_groups:
            pg["lr"] = lr

        ws_expand = w_opt.repeat(1, num_ws, 1)      # noise factor 0
        pred_dict = G.synthesis(ws_expand, pred_cam, noise_mode="const",
                                force_fp32=True)
        pred_depths = pred_dict["image_depth"]
        pred_images = pred_dict["image"] * 127.5 + 128

        ws_clone = ws_expand.clone().detach()
        ccam_clone = canonical_cam.clone().detach()
        warp_loss, _ = calc_warping_loss(
            ws_clone, ccam_clone, pred_ext, init_ext, intrinsic,
            pred_depths, target_images_contiguous, G, s["vgg"],
            ray_generator, layers="14")

        if pred_images.shape[2] > target_images.shape[2]:
            pred_images = torch.nn.functional.interpolate(
                pred_images, size=target_images.shape[2:], mode="area")
        synth_features = _torch_lpips_embed(s["vgg"], s["head_ws"],
                                            pred_images)
        dist = (target_features - synth_features).square().sum()

        reg_loss = 0.0
        for v in list(noise_bufs.values()) + list(noise_bufs2.values()):
            noise = v[None, None, :, :]
            while True:
                reg_loss += (noise * torch.roll(noise, 1, 3)).mean() ** 2
                reg_loss += (noise * torch.roll(noise, 1, 2)).mean() ** 2
                if noise.shape[2] <= 8:
                    break
                noise = torch.nn.functional.avg_pool2d(noise, 2)

        loss = dist + reg_loss * 1e5 + warp_loss

        if step < P:
            cam_optimizer.zero_grad()
            translation_optimizer.zero_grad()
            loss.backward()
            cam_optimizer.step()
            translation_optimizer.step()
        else:
            optimizer.zero_grad()
            cam_optimizer.zero_grad()
            translation_optimizer.zero_grad()
            loss.backward()
            cam_optimizer.step()
            optimizer.step()
            translation_optimizer.step()

        with torch.no_grad():
            for b in list(noise_bufs.values()) + list(noise_bufs2.values()):
                b -= b.mean()
                b *= b.square().mean().rsqrt()

        log["dist"].append(float(dist))
        log["warp"].append(float(warp_loss))

    G.superresolution = orig_sr
    return dict(log=log, w=w_opt.detach().numpy(),
                cam=pred_cam.detach().numpy(),
                translation=translation_opt.detach().numpy())


def _run_tgi_loop(s):
    """Projector's scanned step with identical initial state."""
    from tgi.invert import Projector, ProjectorConfig
    from tgi.io import (captured_state_dict, convert_generator_params,
                        generator_config_from_captured, load_network_pkl)
    from tgi.models import TriPlaneGenerator
    from tgi.models.pose_resnet import convert_torch_state_dict
    from tgi.models.vgg import convert_torch_features, lpips_features

    data = load_network_pkl(s["blob"])
    cap = data["G_ema"]
    G = TriPlaneGenerator(generator_config_from_captured(cap))
    gen_params = convert_generator_params(captured_state_dict(cap))

    vgg_sd = {f"features.{k}": v.detach().numpy()
              for k, v in s["vgg"].state_dict().items()}
    vgg_params = convert_torch_features(vgg_sd)
    lpips_head = {f"lin{i}": {"weight": jnp.asarray(w)}
                  for i, w in enumerate(s["head_ws"])}
    pose_params = convert_torch_state_dict(
        {k: v.detach().numpy() for k, v in s["cam_net"].state_dict().items()})

    cfg = ProjectorConfig(num_steps=N_PRE + N_JOINT, cam_preheat_steps=N_PRE,
                          camera_mode="quat", initial_noise_factor=0.0,
                          w_avg_samples=8, render_fp32=True)
    proj = Projector(G, gen_params, vgg_params, lpips_head, pose_params, cfg)

    target = jnp.asarray(s["target"].numpy())[None]          # [1,3,128,128]
    target_255 = (target + 1.0) * 127.5
    tfeats = lpips_features(vgg_params, lpips_head, target_255)

    train_state, opt_states, _ = proj.init_state(jax.random.PRNGKey(0),
                                                 target_255)
    # Identical initial state: ported w0 + noise values; w_std unused
    # (noise factor 0) but pass a fixed value.
    train_state["w"] = jnp.asarray(s["w0"].numpy())
    train_state["noise"] = {k: jnp.asarray(v.numpy())
                            for k, v in s["noise_vals"].items()}
    opts = proj._optimizers()
    opt_states = {
        "w": opts["w"].init({"w": train_state["w"],
                             "noise": train_state["noise"]}),
        "cam": opts["cam"].init(train_state["pose"]),
        "trans": opts["trans"].init(train_state["translation"]),
    }

    step_a = proj._make_step(target_255, tfeats, jnp.float32(1.0),
                             preheat=True, target_warp=target)
    step_b = proj._make_step(target_255, tfeats, jnp.float32(1.0),
                             preheat=False, target_warp=target)
    carry = (train_state, opt_states, jax.random.PRNGKey(1))
    carry, m_a = jax.lax.scan(step_a, carry, jnp.arange(N_PRE))
    carry, m_b = jax.lax.scan(step_b, carry,
                              jnp.arange(N_PRE, N_PRE + N_JOINT))
    train_state = carry[0]

    from tgi.invert.projector import assemble_camera, resnet34_apply
    pose_out = resnet34_apply(train_state["pose"], target_255)
    _, cam = assemble_camera(pose_out, train_state["translation"], "quat",
                             2.7, proj.intrinsic.reshape(9))
    dist = np.concatenate([np.asarray(m_a["dist"]), np.asarray(m_b["dist"])])
    warp = np.concatenate([np.asarray(m_a["warp"]), np.asarray(m_b["warp"])])
    return dict(dist=dist, warp=warp, w=np.asarray(train_state["w"]),
                cam=np.asarray(cam),
                translation=np.asarray(train_state["translation"]))


def test_init_state_e4e_parity(setup):
    """Starting-latent parity with an e4e encoder in the loop:
    w_opt = mean_w + RAW encoder output (w_projector.py:98-115; pSp2
    returns codes[:, 0, :] with NO latent_avg added, e4e/psp.py:47-64).

    (a) mean_w golden: the reference's own z samples through the torch
        mapping at its cam_init (w_projector.py:87-97, euler2rot(pi/2,
        pi/2) == the canonical extrinsic to fp eps) vs the ported tgi
        mapping — same z, same truncation.
    (b) init_state formula: with a shared deterministic stand-in encoder,
        the starting w must be w_avg + enc(target), and the encoder must
        be fed the [0,255]-scaled 256-res target (w_projector.py:73).
    """
    import torch
    from tgi.io import (captured_state_dict, convert_generator_params,
                        generator_config_from_captured, load_network_pkl)
    from tgi.models import TriPlaneGenerator
    from tgi.models.pose_resnet import convert_torch_state_dict
    from tgi.models.vgg import convert_torch_features
    from tgi.invert import Projector, ProjectorConfig

    data = load_network_pkl(setup["blob"])
    cap = data["G_ema"]
    G = TriPlaneGenerator(generator_config_from_captured(cap))
    gen_params = convert_generator_params(captured_state_dict(cap))

    # (a) mean_w: reference w_projector.py:92-97 verbatim on the torch G.
    n = 32
    z_np = np.random.RandomState(123).randn(n, 512).astype(np.float32)
    intrinsic = torch.tensor([[4.2647, 0, 0.5, 0, 4.2647, 0.5, 0, 0, 1.0]])
    from utils.camera_utils import euler2rot
    with torch.no_grad():
        ext = euler2rot(torch.tensor([math.pi / 2]),
                        torch.tensor([math.pi / 2]), torch.zeros(1, 1),
                        batch_size=1)
        cam_init = torch.cat([ext, intrinsic], dim=-1)
        w_samples = setup["G"].mapping(torch.from_numpy(z_np),
                                       cam_init.repeat(n, 1),
                                       truncation_cutoff=14,
                                       truncation_psi=0.7)
    ref_w_avg = w_samples[:, :1, :].numpy().mean(axis=0, keepdims=True)

    from tgi.invert.projector import CANONICAL_EXTRINSIC, DEFAULT_INTRINSIC
    cam_tgi = jnp.concatenate(
        [jnp.asarray(CANONICAL_EXTRINSIC).reshape(1, 16),
         jnp.asarray(DEFAULT_INTRINSIC).reshape(1, 9)], axis=-1)
    ws_tgi = G.mapping(gen_params, jnp.asarray(z_np),
                       jnp.tile(cam_tgi, (n, 1)),
                       truncation_psi=0.7, truncation_cutoff=14)
    got_w_avg = np.asarray(ws_tgi[:, 0, :]).mean(axis=0, keepdims=True)
    np.testing.assert_allclose(got_w_avg, ref_w_avg[0], rtol=1e-4,
                               atol=2e-5)

    # (b) init_state: start = w_avg + raw encoder delta, encoder fed the
    # [0,255] target.
    seen = {}
    delta = np.random.RandomState(5).randn(1, 512).astype(np.float32)

    def stub_encode(img):
        seen["img"] = np.asarray(img)
        return jnp.asarray(delta)

    vgg_sd = {f"features.{k}": v.detach().numpy()
              for k, v in setup["vgg"].state_dict().items()}
    pose_params = convert_torch_state_dict(
        {k: v.detach().numpy()
         for k, v in setup["cam_net"].state_dict().items()})
    proj = Projector(G, gen_params, convert_torch_features(vgg_sd),
                     {f"lin{i}": {"weight": jnp.asarray(w)}
                      for i, w in enumerate(setup["head_ws"])},
                     pose_params,
                     ProjectorConfig(w_avg_samples=8),
                     e4e_encode=stub_encode)
    target_255 = (jnp.asarray(setup["target"].numpy())[None] + 1.0) * 127.5
    key = jax.random.PRNGKey(11)
    train_state, _, _ = proj.init_state(key, target_255)
    k_stats, _ = jax.random.split(key)
    w_avg, _ = proj.compute_w_stats(k_stats)
    np.testing.assert_allclose(np.asarray(train_state["w"]),
                               np.asarray(w_avg + delta[:, None, :]),
                               rtol=1e-6, atol=1e-6)
    assert seen["img"].max() > 2.0, "encoder must see the [0,255] target"


def test_stage1_step_trajectory_parity(setup):
    ref = _run_torch_loop(setup)
    got = _run_tgi_loop(setup)

    ref_dist = np.asarray(ref["log"]["dist"])
    ref_warp = np.asarray(ref["log"]["warp"])
    np.testing.assert_allclose(got["dist"], ref_dist, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(got["warp"], ref_warp, rtol=2e-2, atol=2e-4)

    # Final camera (preheat moved the pose net; joint kept moving it):
    # rotation entries tight; the ext translation is -radius * R[:, :, 2]
    # (w_projector.py:160) so rotation noise is amplified 2.7x there.
    got_ext = got["cam"][0, :16].reshape(4, 4)
    ref_ext = ref["cam"][0, :16].reshape(4, 4)
    np.testing.assert_allclose(got_ext[:3, :3], ref_ext[:3, :3], atol=3e-4)
    np.testing.assert_allclose(got_ext[:3, 3], ref_ext[:3, 3], atol=1e-3)
    np.testing.assert_allclose(got["translation"], ref["translation"],
                               atol=1e-4)

    # w trajectory: 3 Adam steps from identical grads. Sign flips near
    # zero-gradient coordinates bound the worst case; require the bulk
    # to agree tightly.
    dw = np.abs(got["w"] - ref["w"].reshape(got["w"].shape))
    assert np.median(dw) < 2e-4, np.median(dw)
    assert dw.mean() < 1e-3, dw.mean()
