"""Self-inversion quality gate.

Generates a target FROM the generator itself at a known (w*, cam*), runs
the real two-stage PTI pipeline (Projector -> PTICoach, the same classes
run_pti drives), and reports reconstruction quality plus pose recovery —
the closed-loop evidence that the inversion machinery actually inverts
(reference quality protocol: single_id_coach.py:87-106, BASELINE.md
north star "matched LPIPS/ID"). Needs no external weights: the optimum
(w*, cam*) exists by construction, MS-SSIM/MSE/pose error are
weight-free metrics, and the LPIPS trajectory demonstrates the 0.06
early stop (calibrated values require pretrained LPIPS weights; with
random weights the threshold still engages once the reconstruction is
pixel-close, because d(x, x) = 0 for any weights).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def rotation_error_deg(cam_a, cam_b):
    """Geodesic angle (degrees) between the extrinsic rotations of two
    packed [N, 25] cameras."""
    Ra = cam_a[:, :16].reshape(-1, 4, 4)[:, :3, :3]
    Rb = cam_b[:, :16].reshape(-1, 4, 4)[:, :3, :3]
    tr = jnp.einsum("nij,nij->n", Ra, Rb)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def aim_pose_net(pose_params, target_255, true_rotmat, *, err_deg=3.0,
                 camera_mode="quat", key=None, calibrate=True):
    """Return pose-net params whose prediction FOR THIS TARGET is
    ``true_rotmat`` perturbed by ``err_deg`` (geodesic).

    The reference's ResNet-34 pose estimator is pretrained
    (run_pti.py:36-45) and stage 1 only *refines* it — the quat camera
    lr is 6e-7 (hyperparameters.py:29-32). A random-init net predicts an
    arbitrary rotation the optimizer cannot meaningfully move at that
    lr, so a weight-free gate would measure the random head, not the
    machinery. Two repairs restore the pretrained operating point
    without external weights:

      1. ``calibrate``: set every BatchNorm's running stats from a real
         forward pass (``resnet34_calibrate``). Identity stats compound
         activation variance through 34 layers to O(1e3) — tanh
         saturates for EVERY input, the param->output Jacobian is ~1e5x
         a trained net's (Adam's 6e-7 steps moved the head to a
         saturated corner within 6 steps, measured), and the O(1e3)
         bias shift of step 2 makes Adam's update underflow float32.
      2. Shift the final-layer bias so tanh(fc3(...)) equals the
         desired parameterization at this input.

    Every weight stays real and gradients flow through the whole net
    exactly as in the reference.
    """
    from tgi.models.pose_resnet import resnet34_apply, resnet34_calibrate
    from tgi.render.cameras import axis_angle_rotmat, rotmat_to_quat, \
        rotmat_to_rot6d

    if calibrate:
        pose_params = resnet34_calibrate(pose_params, target_255)
    if key is None:
        key = jax.random.PRNGKey(0)
    axis = jax.random.normal(key, (3,))
    Rp = true_rotmat @ axis_angle_rotmat(axis, math.radians(err_deg))
    if camera_mode == "quat":
        desired = rotmat_to_quat(Rp[None])[0]
    elif camera_mode == "6d":
        desired = rotmat_to_rot6d(Rp[None])[0]
    else:
        raise ValueError(f"aim_pose_net: unsupported mode {camera_mode!r}"
                         " (euler '2d' heads aim via angle offsets)")
    y = resnet34_apply(pose_params, target_255, pre_tanh=True)[0]
    y_des = jnp.arctanh(jnp.clip(desired, -0.999, 0.999))
    fc3 = pose_params["fc3"]
    return {**pose_params, "fc3": {**fc3, "bias": fc3["bias"]
                                   + (y_des - y)}}


def self_inversion_eval(G, gen_params, *, key, vgg_params, lpips_head,
                        pose_params, lpips_loss, first_inv_steps=400,
                        max_pti_steps=400, yaw_offset=0.35,
                        pitch_offset=0.12, camera_mode="quat",
                        truncation_psi=0.7, w_avg_samples=512,
                        render_fp32=False, target_G=None,
                        dispatch_chunk=None, aim_pose_deg=3.0,
                        pti_lpips_threshold=0.0, proj_overrides=None,
                        early_stop_probe=None, e4e_encode=None,
                        aim_calibrate=True):
    """Invert a G-generated target; return quality/pose metrics.

    Mirrors run_pti's per-image path at full step budget:
    stage 1 = Projector.project (two-phase w+pose scan), stage 2 =
    PTICoach.tune.

    ``target_G``: optionally render the target with a DIFFERENT
    generator config (same params) than the one doing the inversion —
    used by bench.py's fast-mode gate, where a reduced-sampling
    pipeline must reconstruct a full-fidelity (48+48 sample) target.

    ``aim_pose_deg``: start the pose net ``err_deg`` off the true
    rotation (see ``aim_pose_net`` — the reference's estimator is
    pretrained; a random net pins the camera at an arbitrary rotation
    and the gate stops measuring the machinery). None/0 leaves the
    random net as-is.

    ``pti_lpips_threshold``: stage-2 early-stop threshold. Defaults to
    0.0 (run the full budget) because the production 0.06 threshold is
    calibrated for PRETRAINED AlexNet-LPIPS — with the random-init
    LPIPS used here it fires spuriously within ~15 steps and the
    final_* metrics would measure the stop, not the tuning. The stop
    mechanism itself is covered by tests/test_inversion.py.

    ``proj_overrides``: extra ProjectorConfig fields (dataclasses.replace
    kwargs) — used by bench.py to gate fast modes like
    ``canon_sr_max_res`` under this harness.

    ``early_stop_probe``: when set (e.g. the production 0.06,
    hyperparameters.py:19-20), ALSO run stage 2 from the same pivot with
    that LPIPS early stop active and report ``es_*`` metrics (steps at
    stop + quality at stop) — the matched-protocol wall-clock evidence
    (the reference's real per-image time includes this stop,
    single_id_coach.py:69). Cheap: the probe run is exactly as long as
    the stop allows. The quality keys beside ``es_steps`` keep the
    number honest when the random-init LPIPS fires the stop early.
    """
    from dataclasses import replace as _replace
    from tgi.invert import CoachConfig, PTICoach, Projector, ProjectorConfig
    from tgi.losses.warp import area_downsample
    from tgi.metrics import ms_ssim
    from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                    pack_camera)

    k_z, k_proj, k_tune = jax.random.split(key, 3)

    # Known ground truth: w* from a random z at the canonical camera,
    # cam* off-frontal by (yaw, pitch) — within the pose estimator-free
    # basin of the camera optimizer.
    proj_cfg = ProjectorConfig(num_steps=first_inv_steps,
                               camera_mode=camera_mode,
                               w_avg_samples=w_avg_samples,
                               render_fp32=render_fp32,
                               dispatch_chunk=dispatch_chunk)
    if proj_overrides:
        proj_cfg = _replace(proj_cfg, **proj_overrides)
    proj = Projector(G, gen_params, vgg_params, lpips_head, pose_params,
                     proj_cfg, e4e_encode=e4e_encode)
    z = jax.random.normal(k_z, (1, G.cfg.z_dim))
    ws_star = G.mapping(gen_params, z, proj.canonical_cam,
                        truncation_psi=truncation_psi,
                        truncation_cutoff=14)
    cam_pose = look_at_pose(math.pi / 2 + yaw_offset,
                            math.pi / 2 + pitch_offset,
                            jnp.asarray([0.0, 0.0, 0.2]), radius=2.7)
    cam_star = pack_camera(cam_pose[None], fov_to_intrinsics(18.837))

    target = jax.jit(lambda p, w, c: (target_G or G).synthesis(
        p, w, c, det=True)["image"])(gen_params, ws_star, cam_star)
    target = jnp.clip(target, -1.0, 1.0)
    res = target.shape[-1]
    t256 = area_downsample(target, 256) if res > 256 else (
        jax.image.resize(target, (1, 3, 256, 256), method="linear")
        if res < 256 else target)
    target_255 = (t256 + 1.0) * 127.5

    from tgi.invert.projector import assemble_camera
    from tgi.models.pose_resnet import resnet34_apply

    net_pose_err = None
    if aim_pose_deg:
        # Aim the head aim_pose_deg off the truth — the operating point
        # of the reference's PRETRAINED estimator (ImageNet init + long
        # pseudo-dataset training; the scratch bootstrap net's raw
        # prediction on a single target varies 2-25 deg run to run).
        # The un-aimed net's own prediction error is still recorded as
        # net_pose_err_deg so the bootstrap capability is visible.
        # ``aim_calibrate=False`` for bootstrapped (already-trained)
        # nets — recalibrating would shift their operating point.
        po_raw = resnet34_apply(pose_params, target_255)
        _, cam_raw = assemble_camera(po_raw, jnp.zeros((1, 3)),
                                     camera_mode, 2.7,
                                     proj.intrinsic.reshape(9))
        net_pose_err = float(rotation_error_deg(cam_raw, cam_star)[0])
        pose_params = aim_pose_net(pose_params, target_255,
                                   cam_pose[:3, :3],
                                   err_deg=aim_pose_deg,
                                   camera_mode=camera_mode, key=key,
                                   calibrate=aim_calibrate)
        proj = Projector(G, gen_params, vgg_params, lpips_head,
                         pose_params, proj_cfg, e4e_encode=e4e_encode)
    pose_out0 = resnet34_apply(pose_params, target_255)
    _, cam0 = assemble_camera(pose_out0, jnp.zeros((1, 3)), camera_mode,
                              2.7, proj.intrinsic.reshape(9))
    init_pose_err = float(rotation_error_deg(cam0, cam_star)[0])

    # Stage 1 (full-res [-1,1] target for the warp loss, as run_pti).
    ws, cam, _state, metrics = proj.project(k_proj, target_255,
                                            target_full=target)

    # Jitted eval paths: an eager G.synthesis is hundreds of individual
    # relay dispatches on TPU (~1 min per render through axon) and this
    # function renders ~12 times (pivot/final/es + qconv checkpoints).
    # One compiled program, shared by every (params)->metrics eval.
    @jax.jit
    def _eval(p):
        img = jnp.clip(G.synthesis(p, ws, cam, det=True)["image"],
                       -1.0, 1.0)
        return {
            "mse": jnp.mean(jnp.square(img - target)),
            "lpips": lpips_loss.from_unit(img, target).sum(),
            "ms_ssim": ms_ssim((img + 1) / 2, (target + 1) / 2).mean(),
        }

    def quality(p):
        return {k: float(v) for k, v in _eval(p).items()}

    # Stage 2. When chunked, trace reconstruction quality at every chunk
    # boundary: the reference's production protocol stops tuning once its
    # (pretrained-)LPIPS crosses 0.06 — i.e. at quality convergence
    # (single_id_coach.py:69). The weight-free analog recorded here is
    # the first boundary whose MS-SSIM is within 0.01 of the full-budget
    # final ("qconv"), which the bench charges as the matched-protocol
    # wall-clock; es_* below demonstrates the literal threshold machinery.
    qtrace = []

    def _quality_ckpt(step, p):
        qtrace.append((step, float(_eval(p)["ms_ssim"])))

    coach = PTICoach(G, lpips_loss,
                     CoachConfig(max_pti_steps=max_pti_steps,
                                 lpips_threshold=pti_lpips_threshold,
                                 dispatch_chunk=dispatch_chunk))
    tuned, info = coach.tune(
        k_tune, gen_params, ws, cam, target,
        checkpoint_fn=_quality_ckpt if dispatch_chunk else None)

    es = None
    if early_stop_probe:
        coach_es = PTICoach(G, lpips_loss,
                            CoachConfig(max_pti_steps=max_pti_steps,
                                        lpips_threshold=early_stop_probe,
                                        dispatch_chunk=dispatch_chunk))
        tuned_es, info_es = coach_es.tune(k_tune, gen_params, ws, cam,
                                          target)
        es = (tuned_es, info_es)

    out = {"pivot_" + k: v for k, v in quality(gen_params).items()}
    out.update({"final_" + k: v for k, v in quality(tuned).items()})
    out.update({
        "pose_err_deg": float(rotation_error_deg(cam, cam_star)[0]),
        "pti_steps": int(info["steps"]),
        "pti_final_lpips": float(info["final_lpips"]),
        "stage1_final_loss": float(np.asarray(metrics["loss"])[-1]),
        "stage1_first_loss": float(np.asarray(metrics["loss"])[0]),
        "w_err": float(jnp.linalg.norm(ws[:, 0] - ws_star[:, 0])),
    })
    if init_pose_err is not None:
        out["init_pose_err_deg"] = init_pose_err
    if net_pose_err is not None:
        out["net_pose_err_deg"] = net_pose_err
    if qtrace:
        bar = out["final_ms_ssim"] - 0.01
        hit = [(s, m) for s, m in qtrace if m >= bar]
        qs, qm = hit[0] if hit else (int(info["steps"]),
                                     out["final_ms_ssim"])
        out["qconv_steps"] = int(qs)
        out["qconv_ms_ssim"] = float(qm)
        out["quality_trace"] = [(int(s), round(m, 4)) for s, m in qtrace]
    if es is not None:
        tuned_es, info_es = es
        out.update({"es_" + k: v for k, v in quality(tuned_es).items()})
        out["es_steps"] = int(info_es["steps"])
        out["es_threshold"] = float(early_stop_probe)
    return out


# Per-image (yaw, pitch) ground-truth camera offsets for the batched
# gate; image 0 matches self_inversion_eval's defaults so its metrics
# are directly comparable to the single-image gate at the same key.
_BATCH_POSE_OFFSETS = ((0.35, 0.12), (-0.3, 0.08), (0.25, -0.1),
                       (-0.2, -0.15))


def self_inversion_eval_batch(G, gen_params, *, key, vgg_params,
                              lpips_head, pose_params, lpips_loss,
                              batch_size=4, first_inv_steps=400,
                              max_pti_steps=400, camera_mode="quat",
                              truncation_psi=0.7, w_avg_samples=512,
                              render_fp32=False, dispatch_chunk=None,
                              aim_pose_deg=3.0, pti_lpips_threshold=0.0,
                              aim_calibrate=True, proj_overrides=None):
    """Closed-loop gate for BATCHED inversion: batch_size targets with
    known per-image (w*, cam*), inverted SIMULTANEOUSLY through
    Projector.project_batch (per-image optimization states vmapped,
    remat_render bounding the B x two-view residual memory), then
    per-image PTICoach.tune. Verifies the reference's strictly-per-image
    semantics (w_projector.py:62, 120-131) hold at B > 1.

    Image 0 reuses self_inversion_eval's exact key split and camera
    offsets, so per_image[0] is directly comparable to the single-image
    gate at the same ``key``. Returns per-image quality dicts plus
    batch aggregates.
    """
    from tgi.invert import CoachConfig, PTICoach, Projector, ProjectorConfig
    from tgi.losses.warp import area_downsample
    from tgi.metrics import ms_ssim
    from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                    pack_camera)

    k_z, k_proj, k_tune = jax.random.split(key, 3)
    B = batch_size

    proj_cfg = ProjectorConfig(num_steps=first_inv_steps,
                               camera_mode=camera_mode,
                               w_avg_samples=w_avg_samples,
                               render_fp32=render_fp32, remat_render=True,
                               dispatch_chunk=dispatch_chunk)
    if proj_overrides:
        from dataclasses import replace as _replace
        proj_cfg = _replace(proj_cfg, **proj_overrides)
    proj = Projector(G, gen_params, vgg_params, lpips_head, pose_params,
                     proj_cfg)

    # Params threaded as jit args (never closure constants — large
    # host-side constants can exceed the axon relay's request limit).
    synth = jax.jit(lambda p, w, c: jnp.clip(
        G.synthesis(p, w, c, det=True)["image"], -1.0, 1.0))
    targets, t255s, cams_star, ws_stars = [], [], [], []
    aimed_nets, init_pose_errs = [], []
    for i in range(B):
        kz_i = k_z if i == 0 else jax.random.fold_in(k_z, i)
        z = jax.random.normal(kz_i, (1, G.cfg.z_dim))
        ws_star = G.mapping(gen_params, z, proj.canonical_cam,
                            truncation_psi=truncation_psi,
                            truncation_cutoff=14)
        yaw, pitch = _BATCH_POSE_OFFSETS[i % len(_BATCH_POSE_OFFSETS)]
        cam_pose = look_at_pose(math.pi / 2 + yaw, math.pi / 2 + pitch,
                                jnp.asarray([0.0, 0.0, 0.2]), radius=2.7)
        cam_star = pack_camera(cam_pose[None], fov_to_intrinsics(18.837))
        target = synth(gen_params, ws_star, cam_star)
        res = target.shape[-1]
        t256 = area_downsample(target, 256) if res > 256 else (
            jax.image.resize(target, (1, 3, 256, 256), method="linear")
            if res < 256 else target)
        t255 = (t256 + 1.0) * 127.5
        if aim_pose_deg:
            # Per-image aimed pose nets (see aim_pose_net): image 0 uses
            # the single-image gate's exact key so its start matches.
            k_aim = key if i == 0 else jax.random.fold_in(key, 1000 + i)
            aimed = aim_pose_net(pose_params, t255, cam_pose[:3, :3],
                                 err_deg=aim_pose_deg,
                                 camera_mode=camera_mode, key=k_aim,
                                 calibrate=aim_calibrate)
            from tgi.invert.projector import assemble_camera
            from tgi.models.pose_resnet import resnet34_apply
            _, cam0 = assemble_camera(
                resnet34_apply(aimed, t255), jnp.zeros((1, 3)),
                camera_mode, 2.7, proj.intrinsic.reshape(9))
            aimed_nets.append(aimed)
            init_pose_errs.append(float(rotation_error_deg(cam0,
                                                           cam_star)[0]))
        targets.append(target)
        t255s.append(t255)
        cams_star.append(cam_star)
        ws_stars.append(ws_star)
    targets = jnp.stack(targets)           # [B, 1, 3, R, R]
    t255s = jnp.stack(t255s)               # [B, 1, 3, 256, 256]
    pose_b = None
    if aimed_nets:
        pose_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                        *aimed_nets)

    ws, cams, _states, _metrics = proj.project_batch(
        k_proj, t255s, targets_warp=targets, pose_params_b=pose_b)

    # Stage 2 batched too (PTICoach.tune_batch): per-image generator
    # copies tuned simultaneously with exact per-image early-stop lanes —
    # equivalent to B sequential tunes up to batched-matmul
    # reassociation, so the gate validates the fully-batched schedule.
    coach = PTICoach(G, lpips_loss,
                     CoachConfig(max_pti_steps=max_pti_steps, remat=True,
                                 lpips_threshold=pti_lpips_threshold,
                                 dispatch_chunk=dispatch_chunk))
    tuned_b, info_b = coach.tune_batch(k_tune, gen_params, ws, cams,
                                       targets)

    per_image = []
    for i in range(B):
        tuned = jax.tree_util.tree_map(lambda x: x[i], tuned_b)
        info = {k: v[i] for k, v in info_b.items()}
        final = jnp.clip(G.synthesis(tuned, ws[i], cams[i],
                                     det=True)["image"], -1.0, 1.0)
        per_image.append({
            "final_mse": float(jnp.mean(jnp.square(final - targets[i]))),
            "final_lpips": float(lpips_loss.from_unit(final,
                                                      targets[i]).sum()),
            "final_ms_ssim": float(ms_ssim((final + 1) / 2,
                                           (targets[i] + 1) / 2).mean()),
            "pose_err_deg": float(rotation_error_deg(cams[i],
                                                     cams_star[i])[0]),
            "pti_steps": int(info["steps"]),
            "w_err": float(jnp.linalg.norm(ws[i][:, 0]
                                           - ws_stars[i][:, 0])),
        })
        if init_pose_errs:
            per_image[-1]["init_pose_err_deg"] = init_pose_errs[i]
    return {
        "per_image": per_image,
        "mean_final_ms_ssim": float(np.mean([p["final_ms_ssim"]
                                             for p in per_image])),
        "mean_final_mse": float(np.mean([p["final_mse"]
                                         for p in per_image])),
        "max_pose_err_deg": float(np.max([p["pose_err_deg"]
                                          for p in per_image])),
    }
