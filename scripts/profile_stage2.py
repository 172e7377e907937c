"""Decompose the stage-2 (PTI) step on the chip: where do the ~43 ms
between the loss fwd+bwd core (~56 ms) and the full bench step (~99 ms)
go? Every variant is a REAL fed-back scan (no hoisting, varying inputs).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tgi.models import TriPlaneGenerator, GeneratorConfig
from tgi.invert import PTICoach, CoachConfig
from tgi.losses.lpips import AlexLPIPSLoss

key = jax.random.PRNGKey(0)
G = TriPlaneGenerator(GeneratorConfig(fused_dtype="bfloat16"))
params = G.init(key)
lp = AlexLPIPSLoss(key=jax.random.PRNGKey(5))
coach = PTICoach(G, lp, CoachConfig())
ws = jnp.zeros((1, G.cfg.num_ws, 512))
from tgi.render.cameras import fov_to_intrinsics, look_at_pose, pack_camera
cam = look_at_pose(np.pi / 2, np.pi / 2, jnp.asarray([0., 0., 0.2]),
                   radius=2.7)
c = pack_camera(cam[None], fov_to_intrinsics(18.837))
real = jnp.zeros((1, 3, 512, 512))
grad_fn = jax.grad(coach._loss, has_aux=True)
N = 8

n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
print(f"param count: {n_params/1e6:.1f} M")


def bench(name, fn, *args):
    t0 = time.time()
    jax.block_until_ready(fn(*args))
    compile_s = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name:44s} {np.median(ts)/N*1e3:8.2f} ms/step "
          f"(compile {compile_s:.0f}s)", flush=True)


# A: fwd only (loss value), fed-back perturbation
@jax.jit
def scan_fwd(p):
    def body(carry, i):
        pp = carry
        k = jax.random.fold_in(jax.random.PRNGKey(2), i)
        loss, _ = coach._loss(pp, ws, c, real, k)
        pp = jax.tree_util.tree_map(lambda a: a * (1 - 1e-12 * loss), pp)
        return pp, None
    carry, _ = jax.lax.scan(body, p, jnp.arange(N))
    return carry["decoder"]["net0"]["weight"]


# B: grad only, sgd coupling
@jax.jit
def scan_grad(p):
    def body(carry, i):
        pp = carry
        k = jax.random.fold_in(jax.random.PRNGKey(2), i)
        g, _ = grad_fn(pp, ws, c, real, k)
        pp = jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, pp, g)
        return pp, None
    carry, _ = jax.lax.scan(body, p, jnp.arange(N))
    return carry["decoder"]["net0"]["weight"]


# C: grad + adam (the bench step)
opt_state0 = jax.jit(coach.opt.init)(params)


@jax.jit
def scan_adam(p, os_):
    def body(carry, i):
        pp, o = carry
        k = jax.random.fold_in(jax.random.PRNGKey(2), i)
        g, _ = grad_fn(pp, ws, c, real, k)
        upd, o = coach.opt.update(g, o, pp)
        return (optax.apply_updates(pp, upd), o), None
    carry, _ = jax.lax.scan(body, (p, os_), jnp.arange(N))
    return carry[0]["decoder"]["net0"]["weight"]


# D: adam machinery alone (fake grads = params)
@jax.jit
def scan_adam_only(p, os_):
    def body(carry, i):
        pp, o = carry
        g = jax.tree_util.tree_map(lambda a: a * 1e-9, pp)
        upd, o = coach.opt.update(g, o, pp)
        return (optax.apply_updates(pp, upd), o), None
    carry, _ = jax.lax.scan(body, (p, os_), jnp.arange(N))
    return carry[0]["decoder"]["net0"]["weight"]


bench("A loss fwd only", scan_fwd, params)
bench("B grad (sgd coupling)", scan_grad, params)
bench("D adam machinery only", scan_adam_only, params, opt_state0)
bench("C grad + adam (bench step)", scan_adam, params, opt_state0)
