"""Measure the stage-1 canonical-render lever (VERDICT r4 #6) on-chip.

Per stage-1 step the reference renders the canonical view at full 512²
SR, whose ONLY consumer is a <=256-res VGG feature map
(warping_loss.py:7-10): the raw/depth outputs are already dead-code (XLA
DCE removes them — measured here as "noop" ≈ parity), and canon_sr_max_res
=256 skips the 512² SR block entirely. Prints one JSON line per variant.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tgi.bench_util import setup_compile_cache

setup_compile_cache()

import bench
from tgi.models import TriPlaneGenerator, GeneratorConfig
from tgi.render.cameras import fov_to_intrinsics, look_at_pose, pack_camera
from tgi.invert import Projector, ProjectorConfig
from tgi.losses.lpips import AlexLPIPSLoss
from tgi.models.pose_resnet import resnet34_init
from tgi.models.vgg import lpips_features, lpips_head_init, vgg16_init


def main():
    key = jax.random.PRNGKey(0)
    G = TriPlaneGenerator(GeneratorConfig(fused_dtype="bfloat16"))
    params = G.init(key)
    cam = look_at_pose(np.pi / 2, np.pi / 2, jnp.asarray([0., 0., 0.2]),
                       radius=2.7)
    c = pack_camera(cam[None], fov_to_intrinsics(18.837))
    ws = jnp.zeros((1, G.cfg.num_ws, 512))
    kv, kh, kp = jax.random.split(key, 3)
    vgg = vgg16_init(kv)
    head = lpips_head_init(kh)
    pose = resnet34_init(kp, output_dims=4)
    target = jnp.zeros((1, 3, 256, 256))
    tfeats = lpips_features(vgg, head, target)
    proj0 = Projector(G, params, vgg, head, pose,
                      ProjectorConfig(w_avg_samples=512, render_fp32=False))
    ts, opt_states, w_std = proj0.init_state(jax.random.PRNGKey(1), target)
    real = jnp.zeros((1, 3, 512, 512))
    lp = AlexLPIPSLoss(key=jax.random.PRNGKey(5))
    shared = dict(params=params, ws=ws, c=c, real=real, target=target,
                  tfeats=tfeats, ts=ts, opt_states=opt_states, w_std=w_std,
                  vgg=vgg, head=head, pose=pose, lp=lp)

    for name, ovr in [("parity", None),
                      ("canon256", {"canon_sr_max_res": 256}),
                      ("canon128", {"canon_sr_max_res": 128})]:
        t0 = time.perf_counter()
        s1, s2 = bench.measure_stage_steps(G, **shared, proj_overrides=ovr)
        print(json.dumps({"variant": name, "stage1_step_ms": round(s1, 2),
                          "stage2_step_ms": round(s2, 2),
                          "wall_s": round(time.perf_counter() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
