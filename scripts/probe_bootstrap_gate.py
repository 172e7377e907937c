"""Measure the self-bootstrapped gate: aux-net pretraining from the
generator (tgi/invert/bootstrap.py) followed by the stage-1 pose
trajectory — does the projector now REFINE the pose instead of the
random-VGG divergence (probe_pose_divergence.py: 3 -> 80 deg)?

Run on the TPU: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/probe_bootstrap_gate.py [stage1_steps]
"""

import json
import math
import sys
import time

import jax

from tgi.bench_util import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp
import numpy as np

from tgi.models import TriPlaneGenerator, GeneratorConfig
from tgi.models.pose_resnet import resnet34_init, resnet34_apply
from tgi.models.vgg import lpips_features, lpips_head_init, vgg16_init
from tgi.invert import Projector, ProjectorConfig
from tgi.invert.bootstrap import bootstrap_aux_nets
from tgi.invert.projector import assemble_camera
from tgi.invert.selfinv import rotation_error_deg
from tgi.losses.warp import area_downsample
from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                pack_camera)


def main():
    T0 = time.perf_counter()
    key = jax.random.PRNGKey(0)
    G = TriPlaneGenerator(GeneratorConfig(fused_dtype="bfloat16"))
    params = G.init(key)
    kv, kh, kp = jax.random.split(key, 3)
    vgg0 = vgg16_init(kv)
    head = lpips_head_init(kh)
    pose0 = resnet34_init(kp, output_dims=4)

    pose, vgg, e4e, report = bootstrap_aux_nets(
        G, params, key=jax.random.PRNGKey(100), pose_params=pose0,
        vgg_params=vgg0,
        log=lambda m: print(f"[{time.perf_counter() - T0:7.1f}s] {m}",
                            flush=True))
    print(json.dumps({"bootstrap_report": report}), flush=True)

    # Gate target (self_inversion_eval seed-42 construction).
    gate_key = jax.random.PRNGKey(42)
    k_z, k_proj, k_tune = jax.random.split(gate_key, 3)
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    proj_cfg = ProjectorConfig(num_steps=steps, camera_mode="quat",
                               w_avg_samples=512, render_fp32=False,
                               dispatch_chunk=50)
    proj = Projector(G, params, vgg, head, pose, proj_cfg,
                     e4e_encode=e4e)
    z = jax.random.normal(k_z, (1, G.cfg.z_dim))
    ws_star = G.mapping(params, z, proj.canonical_cam,
                        truncation_psi=0.7, truncation_cutoff=14)
    cam_pose = look_at_pose(math.pi / 2 + 0.35, math.pi / 2 + 0.12,
                            jnp.asarray([0.0, 0.0, 0.2]), radius=2.7)
    cam_star = pack_camera(cam_pose[None], fov_to_intrinsics(18.837))
    target = jnp.clip(G.synthesis(params, ws_star, cam_star,
                                  det=True)["image"], -1.0, 1.0)
    target_255 = (area_downsample(target, 256) + 1.0) * 127.5

    pose_out0 = resnet34_apply(pose, target_255)
    _, cam0 = assemble_camera(pose_out0, jnp.zeros((1, 3)), "quat", 2.7,
                              proj.intrinsic.reshape(9))
    print("init_pose_err_deg (trained net prediction):",
          float(rotation_error_deg(cam0, cam_star)[0]), flush=True)

    # Landscape sensitivity with the TRAINED vgg + e4e start: does
    # 3 deg of pose now move dist+warp? (Exclude the 1e5-weighted noise
    # reg — it is pose-constant and its ~2e4 magnitude swamps fp32
    # resolution for these deltas.)
    from tgi.invert.selfinv import aim_pose_net
    tfeats = lpips_features(vgg, head, target_255)

    @jax.jit
    def pose_terms(ts):
        _, aux = proj._loss(ts, target_255, tfeats,
                            jnp.zeros_like(ts["w"]),
                            jax.random.PRNGKey(9), target)
        return aux["dist"] + aux["warp"]

    ts0, _, _ = proj.init_state(jax.random.split(k_proj)[0], target_255)
    truth_net = aim_pose_net(pose, target_255, cam_pose[:3, :3],
                             err_deg=0.0, camera_mode="quat",
                             key=gate_key, calibrate=False)
    off3_net = aim_pose_net(pose, target_255, cam_pose[:3, :3],
                            err_deg=3.0, camera_mode="quat",
                            key=gate_key, calibrate=False)
    l_pred = float(pose_terms(ts0))
    l_truth = float(pose_terms({**ts0, "pose": truth_net}))
    l_off3 = float(pose_terms({**ts0, "pose": off3_net}))
    print(json.dumps({"distwarp_at_predicted_init": l_pred,
                      "distwarp_at_truth_init": l_truth,
                      "distwarp_at_3deg_off_init": l_off3}), flush=True)

    def snap(step, train_state, t255):
        po = resnet34_apply(train_state["pose"], t255)
        _, cam = assemble_camera(po, train_state["translation"], "quat",
                                 2.7, proj.intrinsic.reshape(9))
        err = float(rotation_error_deg(cam, cam_star)[0])
        print(json.dumps(
            {"step": int(step), "pose_err_deg": round(err, 3),
             "t": round(time.perf_counter() - T0, 1)}), flush=True)

    ws, cam, state, metrics = proj.project(
        k_proj, target_255, snapshot_fn=snap, snapshot_every=50,
        target_full=target)
    print("final_pose_err_deg",
          float(rotation_error_deg(cam, cam_star)[0]), flush=True)
    loss = np.asarray(metrics["loss"])
    dist = np.asarray(metrics["dist"])
    warp = np.asarray(metrics["warp"])
    for i in list(range(0, len(loss), 50)) + [len(loss) - 1]:
        print(json.dumps({"step": i, "loss": round(float(loss[i]), 4),
                          "dist": round(float(dist[i]), 4),
                          "warp": round(float(warp[i]), 4)}), flush=True)


if __name__ == "__main__":
    main()
