"""Diagnose the self-inversion gate's stage-1 pose drift (BENCH r5
rehearsal: init_pose_err 2.99 deg -> final 80.69 deg).

Replicates bench.py's selfinv section setup bit-for-bit (same seeds,
same random-init nets, same aimed pose net) and runs stage 1 with a
50-step snapshot callback recording:
  - pose rotation error vs cam* (geodesic deg)
  - translation vector (the optimizable camera-frame offset)
  - loss terms at the boundary
plus two landscape probes:
  - loss at the aimed init vs loss with the pose net aimed exactly at
    the truth (is the minimum where it should be at start?)
  - loss at the final state vs the final state with pose reset to truth
    (did w/noise compensation move the minimum?)

Run on the TPU: python scripts/probe_pose_divergence.py
"""

import json
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tgi.bench_util import setup_compile_cache

setup_compile_cache()

from tgi.models import TriPlaneGenerator, GeneratorConfig
from tgi.models.pose_resnet import resnet34_init, resnet34_apply
from tgi.models.vgg import lpips_features, lpips_head_init, vgg16_init
from tgi.losses.lpips import AlexLPIPSLoss
from tgi.losses.warp import area_downsample
from tgi.invert import Projector, ProjectorConfig
from tgi.invert.projector import assemble_camera
from tgi.invert.selfinv import aim_pose_net, rotation_error_deg
from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                pack_camera)


def main():
    key = jax.random.PRNGKey(0)
    G = TriPlaneGenerator(GeneratorConfig(fused_dtype="bfloat16"))
    params = G.init(key)
    kv, kh, kp = jax.random.split(key, 3)
    vgg = vgg16_init(kv)
    head = lpips_head_init(kh)
    pose = resnet34_init(kp, output_dims=4)
    lp = AlexLPIPSLoss(key=jax.random.PRNGKey(5))

    # --- self_inversion_eval's target construction, key=42 ---
    gate_key = jax.random.PRNGKey(42)
    k_z, k_proj, k_tune = jax.random.split(gate_key, 3)
    first_inv_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    proj_cfg = ProjectorConfig(num_steps=first_inv_steps,
                               camera_mode="quat", w_avg_samples=512,
                               render_fp32=False, dispatch_chunk=50)
    proj = Projector(G, params, vgg, head, pose, proj_cfg)
    z = jax.random.normal(k_z, (1, G.cfg.z_dim))
    ws_star = G.mapping(params, z, proj.canonical_cam,
                        truncation_psi=0.7, truncation_cutoff=14)
    yaw_offset, pitch_offset = 0.35, 0.12
    cam_pose = look_at_pose(math.pi / 2 + yaw_offset,
                            math.pi / 2 + pitch_offset,
                            jnp.asarray([0.0, 0.0, 0.2]), radius=2.7)
    cam_star = pack_camera(cam_pose[None], fov_to_intrinsics(18.837))
    target = G.synthesis(params, ws_star, cam_star, det=True)["image"]
    target = jnp.clip(target, -1.0, 1.0)
    t256 = area_downsample(target, 256)
    target_255 = (t256 + 1.0) * 127.5

    aimed = aim_pose_net(pose, target_255, cam_pose[:3, :3], err_deg=3.0,
                         camera_mode="quat", key=gate_key)
    proj = Projector(G, params, vgg, head, aimed, proj_cfg)
    pose_out0 = resnet34_apply(aimed, target_255)
    _, cam0 = assemble_camera(pose_out0, jnp.zeros((1, 3)), "quat", 2.7,
                              proj.intrinsic.reshape(9))
    print("init_pose_err_deg",
          float(rotation_error_deg(cam0, cam_star)[0]), flush=True)

    # Truth-aimed net for landscape probes.
    truth_net = aim_pose_net(pose, target_255, cam_pose[:3, :3],
                             err_deg=0.0, camera_mode="quat",
                             key=gate_key)

    tfeats = lpips_features(vgg, head, target_255)
    loss_fn = jax.jit(lambda ts: proj._loss(
        ts, target_255, tfeats, jnp.zeros_like(ts["w"]),
        jax.random.PRNGKey(9), target)[0])

    # proj.project splits k_proj itself; the exact init state the gate
    # used comes from jax.random.split(k_proj)[0] == its k_init.
    ts0, _, w_std = proj.init_state(jax.random.split(k_proj)[0],
                                    target_255)
    ts_truth = {**ts0, "pose": truth_net}
    l_init = float(loss_fn(ts0))
    l_truth = float(loss_fn(ts_truth))
    print(json.dumps({"loss_at_aimed_init": l_init,
                      "loss_at_truth_init": l_truth}), flush=True)

    traj = []

    def snap(step, train_state, t255):
        po = resnet34_apply(train_state["pose"], t255)
        _, cam = assemble_camera(po, train_state["translation"], "quat",
                                 2.7, proj.intrinsic.reshape(9))
        err = float(rotation_error_deg(cam, cam_star)[0])
        tr = np.asarray(train_state["translation"])[0]
        q = np.asarray(po)[0]
        rec = {"step": int(step), "pose_err_deg": round(err, 3),
               "trans": [round(float(x), 4) for x in tr],
               "quat": [round(float(x), 4) for x in q],
               "t": round(time.perf_counter() - T0, 1)}
        traj.append(rec)
        print(json.dumps(rec), flush=True)

    T0 = time.perf_counter()
    ws, cam, state, metrics = proj.project(
        k_proj, target_255, snapshot_fn=snap, snapshot_every=50,
        target_full=target)
    print("final_pose_err_deg",
          float(rotation_error_deg(cam, cam_star)[0]), flush=True)
    loss = np.asarray(metrics["loss"])
    dist = np.asarray(metrics["dist"])
    warp = np.asarray(metrics["warp"])
    for i in range(0, len(loss), 25):
        print(json.dumps({"step": i, "loss": round(float(loss[i]), 4),
                          "dist": round(float(dist[i]), 4),
                          "warp": round(float(warp[i]), 4)}), flush=True)

    # Landscape at the end: final state vs final state with truth pose.
    l_final = float(loss_fn(state))
    l_final_truth = float(loss_fn({**state, "pose": truth_net,
                                   "translation":
                                   jnp.zeros_like(state["translation"])}))
    print(json.dumps({"loss_at_final": l_final,
                      "loss_at_final_truth_pose": l_final_truth}),
          flush=True)


if __name__ == "__main__":
    main()
