"""Where does batched-inversion superlinearity come from? (PERF.md)

Measures, on the chip, how each pipeline piece scales with the image
batch N at the flagship shape:

  * render fwd          (chained scan, device-bound)
  * render fwd+bwd      (grad wrt ws, chained scan)
  * stage-1 step        (vmapped _make_step_batched, REMAT on/off)

Usage: WHAT=fwd|bwd|step N=2 REMAT=0 python scripts/probe_batch_scaling.py
Each invocation measures ONE point so a relay crash loses nothing and
every dispatch stays far below the ~40 s worker kill threshold.
"""
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

WHAT = os.environ.get("WHAT", "fwd")
N = int(os.environ.get("N", "1"))
REMAT = os.environ.get("REMAT", "0") == "1"
CHAIN = int(os.environ.get("CHAIN", "6"))

key = jax.random.PRNGKey(0)
G = TriPlaneGenerator(GeneratorConfig(fused_dtype="bfloat16"))
params = G.init(key)
ws = jnp.zeros((N, G.cfg.num_ws, 512))

from tgi.render.cameras import fov_to_intrinsics, look_at_pose, pack_camera

cams = []
for i in range(N):
    cams.append(look_at_pose(np.pi / 2 + 0.1 * i, np.pi / 2 - 0.05 * i,
                             jnp.asarray([0., 0., 0.2]), radius=2.7))
c = pack_camera(jnp.stack(cams), fov_to_intrinsics(18.837))


def chained(scalar_fn, n=CHAIN):
    @jax.jit
    def run(s):
        out, _ = jax.lax.scan(lambda s, _: (scalar_fn(s), None), s,
                              None, length=n)
        return out
    t0 = time.time()
    float(run(jnp.float32(0)))
    print(f"  compile+first: {time.time()-t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(jnp.float32(0)))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / n


if WHAT == "fwd":
    def f(s):
        return jnp.mean(G.synthesis(params, ws + s, c,
                                    det=True)["image"]) * 1e-6
    t = chained(f)
    print(f"WHAT=fwd N={N}: {t*1e3:.2f} ms total, {t*1e3/N:.2f} ms/image")

elif WHAT == "bwd":
    def loss(w, s):
        return jnp.mean(jnp.square(
            G.synthesis(params, w + s, c, det=True)["image"]))

    def f(s):
        g = jax.grad(loss)(ws, s)
        return jnp.mean(g) * 1e-6 + s * 1e-12
    t = chained(f)
    print(f"WHAT=bwd N={N}: {t*1e3:.2f} ms total, {t*1e3/N:.2f} ms/image")

elif WHAT == "step":
    from tgi.invert import Projector, ProjectorConfig
    from tgi.models.pose_resnet import resnet34_init
    from tgi.models.vgg import lpips_features, lpips_head_init, vgg16_init

    kv, kh, kp = jax.random.split(key, 3)
    vgg = vgg16_init(kv)
    head = lpips_head_init(kh)
    pose = resnet34_init(kp, output_dims=4)
    proj = Projector(G, params, vgg, head, pose,
                     ProjectorConfig(w_avg_samples=512, render_fp32=False,
                                     remat_render=REMAT))
    targets = jax.random.uniform(jax.random.PRNGKey(21),
                                 (N, 1, 3, 256, 256), maxval=255.0)
    tfeats = jax.vmap(lambda t: lpips_features(vgg, head, t))(targets)
    ts, opt_states, w_std = jax.vmap(proj.init_state)(
        jax.random.split(jax.random.PRNGKey(22), N), targets)
    keys = jax.random.split(jax.random.PRNGKey(23), N)
    step = proj._make_step_batched(w_std[0], False)
    vstep = jax.vmap(step, in_axes=((0, 0, 0), None, 0, 0))

    ns = CHAIN

    @jax.jit
    def scan(ts_, os_, keys_):
        def body(carry, i):
            carry, _ = vstep(carry, i, targets, tfeats)
            return carry, None
        carry, _ = jax.lax.scan(body, (ts_, os_, keys_),
                                jnp.arange(60, 60 + ns))
        return carry[0]["w"]

    t0 = time.time()
    jax.block_until_ready(scan(ts, opt_states, keys))
    print(f"  compile+first: {time.time()-t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(scan(ts, opt_states, keys))  # real fetch
        times.append(time.perf_counter() - t0)
    t = float(np.median(times)) / ns
    print(f"WHAT=step N={N} REMAT={int(REMAT)}: {t*1e3:.2f} ms/step total, "
          f"{t*1e3/N:.2f} ms/step/image")
else:
    raise SystemExit(f"unknown WHAT={WHAT}")
