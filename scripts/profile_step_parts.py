"""Decompose the stage-1 step: loss+grad vs optimizer machinery vs
noise handling. Each variant is a REAL fed-back scan (no hoisting)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tgi.models import TriPlaneGenerator, GeneratorConfig
from tgi.invert import Projector, ProjectorConfig
from tgi.models.pose_resnet import resnet34_init
from tgi.models.vgg import lpips_features, lpips_head_init, vgg16_init

key = jax.random.PRNGKey(0)
G = TriPlaneGenerator(GeneratorConfig(fused_dtype="bfloat16"))
params = G.init(key)
kv, kh, kp = jax.random.split(key, 3)
vgg = vgg16_init(kv)
head = lpips_head_init(kh)
pose = resnet34_init(kp, output_dims=4)
fp32 = os.environ.get("FP32", "0") == "1"
proj = Projector(G, params, vgg, head, pose,
                 ProjectorConfig(w_avg_samples=64, render_fp32=fp32,
                                 batch_views=os.environ.get("BV", "1") == "1"))
target = jnp.zeros((1, 3, 256, 256))
tfeats = lpips_features(vgg, head, target)
ts, opt_states, w_std = proj.init_state(jax.random.PRNGKey(1), target)
grad_fn = jax.grad(proj._loss, has_aux=True)
N = 8


def bench(name, scan_jit, *args):
    t0 = time.time()
    jax.block_until_ready(scan_jit(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(scan_jit(*args))
    print(f"{name:38s} {(time.time()-t0)/N*1e3:8.2f} ms/step "
          f"(compile {compile_s:.0f}s)")


# A: grad only (sgd-esque coupling keeps the scan honest)
@jax.jit
def scan_grad(ts_):
    def body(c, i):
        g, aux = grad_fn(c, target, tfeats, jnp.zeros_like(c["w"]),
                         jax.random.fold_in(jax.random.PRNGKey(2), i))
        c = jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, c, g)
        return c, None
    c, _ = jax.lax.scan(body, ts_, jnp.arange(N))
    return c["w"]


# B: full step (everything)
step = proj._make_step(target, tfeats, w_std, preheat=False)


@jax.jit
def scan_full(ts_, os_):
    carry = (ts_, os_, jax.random.PRNGKey(3))
    carry, _ = jax.lax.scan(step, carry, jnp.arange(60, 60 + N))
    return carry[0]["w"]


# C: grad + the three optimizers, NO noise normalize
opts = proj._optimizers()


@jax.jit
def scan_noreno(ts_, os_):
    def body(carry, i):
        c, os2 = carry
        g, aux = grad_fn(c, target, tfeats, jnp.zeros_like(c["w"]),
                         jax.random.fold_in(jax.random.PRNGKey(2), i))
        cu, cs = opts["cam"].update(g["pose"], os2["cam"], c["pose"])
        pose2 = optax.apply_updates(c["pose"], cu)
        tu, tss = opts["trans"].update(g["translation"], os2["trans"],
                                       c["translation"])
        tr = optax.apply_updates(c["translation"], tu)
        wu, wst = opts["w"].update({"w": g["w"], "noise": g["noise"]},
                                   os2["w"],
                                   {"w": c["w"], "noise": c["noise"]})
        m = optax.apply_updates({"w": c["w"], "noise": c["noise"]}, wu)
        c2 = {"w": m["w"], "noise": m["noise"], "translation": tr,
              "pose": pose2}
        return (c2, {"w": wst, "cam": cs, "trans": tss}), None
    carry, _ = jax.lax.scan(body, (ts_, os_), jnp.arange(N))
    return carry[0]["w"]


print("render_fp32:", fp32, "batch_views:", os.environ.get("BV", "1"))
bench("A grad only", scan_grad, ts)
bench("C grad+optimizers (no noise renorm)", scan_noreno, ts, opt_states)
bench("B full step", scan_full, ts, opt_states)
