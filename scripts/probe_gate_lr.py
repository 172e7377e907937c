"""Ablate the stage-1 camera stream at the reference operating point:
bootstrap nets (cached across runs), pose aimed 3 deg off the truth
(the pretrained estimator's accuracy), e4e start, then short stage-1
trajectories at parity camera lr, lr/10, and lr=0 (frozen camera
sanity: any 'drift' with a frozen camera would be a metric artifact).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_gate_lr.py
"""

import json
import math
import os
import sys
import time

import jax

from tgi.bench_util import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp
import numpy as np

from tgi.models import TriPlaneGenerator, GeneratorConfig
from tgi.models.pose_resnet import (resnet34_init, resnet34_apply,
                                    resnet34_calibrate)
from tgi.models.vgg import lpips_head_init, vgg16_init
from tgi.invert import Projector, ProjectorConfig
from tgi.invert.bootstrap import (make_pseudo_dataset,
                                  train_pose_bootstrap,
                                  train_vgg_bootstrap, make_e4e_encode)
from tgi.invert.projector import assemble_camera
from tgi.invert.selfinv import aim_pose_net, rotation_error_deg
from tgi.io import load_checkpoint, save_checkpoint
from tgi.losses.warp import area_downsample
from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                pack_camera)

CKPT = "/tmp/boot_nets.ckpt"


def get_boot_nets(G, params, log):
    if os.path.exists(CKPT):
        log(f"loading cached bootstrap nets from {CKPT}")
        return load_checkpoint(CKPT)["params"]
    kp0, kv0 = jax.random.split(jax.random.PRNGKey(7))
    pose0 = resnet34_init(kp0, output_dims=4)
    vgg0 = vgg16_init(kv0)
    kd, kp, kv = jax.random.split(jax.random.PRNGKey(100), 3)
    ds = make_pseudo_dataset(G, params, kd, num_images=1024)
    log("dataset done")
    pose0 = resnet34_calibrate(pose0,
                               jnp.asarray(ds["images_255"][:32]))
    pose, pv = train_pose_bootstrap(pose0, ds, steps=2000, key=kp,
                                    log=log)
    log(f"pose done: val rot {pv['val_rot_deg']:.1f} deg")
    vt = train_vgg_bootstrap(vgg0, ds, steps=800, key=kv, log=log)
    nets = {"pose": pose, "vgg": vt["vgg"], "heads": vt["heads"],
            "w_mu": vt["w_mu"], "w_sd": vt["w_sd"],
            "pose_val_rot_deg": jnp.asarray(pv["val_rot_deg"])}
    save_checkpoint(CKPT, nets)
    return nets


def main():
    T0 = time.perf_counter()

    def log(m):
        print(f"[{time.perf_counter() - T0:7.1f}s] {m}", flush=True)

    key = jax.random.PRNGKey(0)
    G = TriPlaneGenerator(GeneratorConfig(fused_dtype="bfloat16"))
    params = G.init(key)
    head = lpips_head_init(jax.random.split(key, 3)[1])
    nets = get_boot_nets(G, params, log)
    e4e = make_e4e_encode(nets["vgg"], nets["heads"], nets["w_mu"],
                          nets["w_sd"])

    gate_key = jax.random.PRNGKey(42)
    k_z, k_proj, _ = jax.random.split(gate_key, 3)
    z = jax.random.normal(k_z, (1, G.cfg.z_dim))
    cam_pose = look_at_pose(math.pi / 2 + 0.35, math.pi / 2 + 0.12,
                            jnp.asarray([0.0, 0.0, 0.2]), radius=2.7)
    cam_star = pack_camera(cam_pose[None], fov_to_intrinsics(18.837))
    canonical = Projector(G, params, nets["vgg"], head, nets["pose"],
                          ProjectorConfig()).canonical_cam
    ws_star = G.mapping(params, z, canonical, truncation_psi=0.7,
                        truncation_cutoff=14)
    target = jnp.clip(G.synthesis(params, ws_star, cam_star,
                                  det=True)["image"], -1.0, 1.0)
    target_255 = (area_downsample(target, 256) + 1.0) * 127.5

    aimed = aim_pose_net(nets["pose"], target_255, cam_pose[:3, :3],
                         err_deg=3.0, camera_mode="quat", key=gate_key,
                         calibrate=False)

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 150

    def run(tag, **cfg_over):
        cfg = ProjectorConfig(num_steps=steps, camera_mode="quat",
                              w_avg_samples=512, render_fp32=False,
                              dispatch_chunk=50, **cfg_over)
        proj = Projector(G, params, nets["vgg"], head, aimed, cfg,
                         e4e_encode=e4e)

        def snap(step, ts, t255):
            po = resnet34_apply(ts["pose"], t255)
            _, cam = assemble_camera(po, ts["translation"], "quat", 2.7,
                                     proj.intrinsic.reshape(9))
            err = float(rotation_error_deg(cam, cam_star)[0])
            print(json.dumps({"run": tag, "step": int(step),
                              "pose_err_deg": round(err, 3)}),
                  flush=True)

        ws, cam, state, metrics = proj.project(
            k_proj, target_255, snapshot_fn=snap, snapshot_every=10,
            target_full=target)
        err = float(rotation_error_deg(cam, cam_star)[0])
        l = np.asarray(metrics["loss"])
        d = np.asarray(metrics["dist"])
        w = np.asarray(metrics["warp"])
        log(f"{tag}: final pose_err {err:.2f} deg; "
            f"dist[0]={d[0]:.4f} dist[49]={d[min(49, len(d)-1)]:.4f} "
            f"dist[-1]={d[-1]:.4f} warp[-1]={w[-1]:.4f} "
            f"loss[-1]={l[-1]:.4f}")
        return err

    base_lr = ProjectorConfig().cam_lr_quat
    run("parity")
    run("cam_lr_div10", cam_lr_quat=base_lr / 10)
    run("cam_lr_0", cam_lr_quat=0.0)


if __name__ == "__main__":
    main()
