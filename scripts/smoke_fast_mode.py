"""On-chip smoke for the fast-mode (32+32 depth samples) config: one
render fwd+bwd and one stage-1 step must compile and run with the
Pallas gather/splat kernels at the reduced point count."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from tgi.bench_util import setup_compile_cache

setup_compile_cache()
import jax.numpy as jnp
import numpy as np

from tgi.models import TriPlaneGenerator, GeneratorConfig
from tgi.render.cameras import fov_to_intrinsics, look_at_pose, pack_camera
from tgi.invert import Projector, ProjectorConfig
from tgi.models.pose_resnet import resnet34_init
from tgi.models.vgg import lpips_features, lpips_head_init, vgg16_init


def main():
    key = jax.random.PRNGKey(0)
    cfg = GeneratorConfig(fused_dtype="bfloat16").with_rendering(
        depth_resolution=32, depth_resolution_importance=32)
    G = TriPlaneGenerator(cfg)
    params = G.init(key)
    cam = look_at_pose(np.pi / 2, np.pi / 2, jnp.asarray([0., 0., 0.2]),
                       radius=2.7)
    c = pack_camera(cam[None], fov_to_intrinsics(18.837))
    ws = jnp.zeros((1, G.cfg.num_ws, 512))

    f = jax.jit(lambda s: jnp.mean(
        G.synthesis(params, ws + s, c, det=True)["image"]))
    g = jax.jit(jax.grad(lambda s: f(s)))
    t0 = time.perf_counter()
    print("fwd:", float(f(jnp.float32(0))),
          "compile+run s:", round(time.perf_counter() - t0, 1))
    t0 = time.perf_counter()
    print("grad:", float(g(jnp.float32(0))),
          "compile+run s:", round(time.perf_counter() - t0, 1))

    kv, kh, kp = jax.random.split(key, 3)
    vgg = vgg16_init(kv)
    head = lpips_head_init(kh)
    pose = resnet34_init(kp, output_dims=4)
    proj = Projector(G, params, vgg, head, pose,
                     ProjectorConfig(w_avg_samples=32, render_fp32=False))
    target = jnp.zeros((1, 3, 256, 256))
    tfeats = lpips_features(vgg, head, target)
    ts, opt_states, w_std = proj.init_state(jax.random.PRNGKey(1), target)
    step = jax.jit(proj._make_step(target, tfeats, w_std, preheat=False))
    t0 = time.perf_counter()
    carry, metrics = step((ts, opt_states, jax.random.PRNGKey(2)),
                          jnp.asarray(60))
    jax.block_until_ready(carry)
    print("stage1 step loss:", float(metrics["loss"]),
          "compile+run s:", round(time.perf_counter() - t0, 1))
    # timed (warm)
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        carry, metrics = step(carry, jnp.asarray(61 + i))
        jax.block_until_ready(carry)
        times.append(time.perf_counter() - t0)
    print("stage1 step warm ms (per-call, relay overhead included):",
          [round(t * 1e3, 1) for t in times])


if __name__ == "__main__":
    main()
