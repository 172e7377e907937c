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


def self_inversion_eval(G, gen_params, *, key, vgg_params, lpips_head,
                        pose_params, lpips_loss, first_inv_steps=400,
                        max_pti_steps=400, yaw_offset=0.35,
                        pitch_offset=0.12, camera_mode="quat",
                        truncation_psi=0.7, w_avg_samples=512,
                        render_fp32=False, target_G=None):
    """Invert a G-generated target; return quality/pose metrics.

    Mirrors run_pti's per-image path at full step budget:
    stage 1 = Projector.project (two-phase w+pose scan), stage 2 =
    PTICoach.tune (early-stopped while_loop).

    ``target_G``: optionally render the target with a DIFFERENT
    generator config (same params) than the one doing the inversion —
    used by bench.py's fast-mode gate, where a reduced-sampling
    pipeline must reconstruct a full-fidelity (48+48 sample) target.
    """
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
                               render_fp32=render_fp32)
    proj = Projector(G, gen_params, vgg_params, lpips_head, pose_params,
                     proj_cfg)
    z = jax.random.normal(k_z, (1, G.cfg.z_dim))
    ws_star = G.mapping(gen_params, z, proj.canonical_cam,
                        truncation_psi=truncation_psi,
                        truncation_cutoff=14)
    cam_pose = look_at_pose(math.pi / 2 + yaw_offset,
                            math.pi / 2 + pitch_offset,
                            jnp.asarray([0.0, 0.0, 0.2]), radius=2.7)
    cam_star = pack_camera(cam_pose[None], fov_to_intrinsics(18.837))

    target = (target_G or G).synthesis(gen_params, ws_star, cam_star,
                                       det=True)["image"]
    target = jnp.clip(target, -1.0, 1.0)
    res = target.shape[-1]
    t256 = area_downsample(target, 256) if res > 256 else (
        jax.image.resize(target, (1, 3, 256, 256), method="linear")
        if res < 256 else target)
    target_255 = (t256 + 1.0) * 127.5

    # Stage 1 (full-res [-1,1] target for the warp loss, as run_pti).
    ws, cam, _state, metrics = proj.project(k_proj, target_255,
                                            target_full=target)
    pivot = G.synthesis(gen_params, ws, cam, det=True)["image"]

    # Stage 2.
    coach = PTICoach(G, lpips_loss, CoachConfig(max_pti_steps=max_pti_steps))
    tuned, info = coach.tune(k_tune, gen_params, ws, cam, target)
    final = G.synthesis(tuned, ws, cam, det=True)["image"]

    def quality(img):
        return {
            "mse": float(jnp.mean(jnp.square(img - target))),
            "lpips": float(lpips_loss.from_unit(img, target).sum()),
            "ms_ssim": float(ms_ssim((img + 1) / 2, (target + 1) / 2
                                     ).mean()),
        }

    out = {"pivot_" + k: v for k, v in quality(pivot).items()}
    out.update({"final_" + k: v for k, v in quality(final).items()})
    out.update({
        "pose_err_deg": float(rotation_error_deg(cam, cam_star)[0]),
        "pti_steps": int(info["steps"]),
        "pti_final_lpips": float(info["final_lpips"]),
        "stage1_final_loss": float(np.asarray(metrics["loss"])[-1]),
        "stage1_first_loss": float(np.asarray(metrics["loss"])[0]),
        "w_err": float(jnp.linalg.norm(ws[:, 0] - ws_star[:, 0])),
    })
    return out
