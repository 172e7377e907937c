"""Standalone repro of the batched stage-1 step TPU fault."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tgi.models import TriPlaneGenerator, GeneratorConfig
from tgi.invert import Projector, ProjectorConfig
from tgi.models.pose_resnet import resnet34_init
from tgi.models.vgg import lpips_features, lpips_head_init, vgg16_init

B = int(os.environ.get("B", "2"))
key = jax.random.PRNGKey(0)
G = TriPlaneGenerator(GeneratorConfig(fused_dtype="bfloat16"))
params = G.init(key)
kv, kh, kp = jax.random.split(key, 3)
vgg = vgg16_init(kv)
head = lpips_head_init(kh)
pose = resnet34_init(kp, output_dims=4)
proj = Projector(G, params, vgg, head, pose,
                 ProjectorConfig(w_avg_samples=64, render_fp32=False,
                                 remat_render=os.environ.get("REMAT", "0") == "1"))

btargets = jnp.zeros((B, 1, 3, 256, 256))
bfeats = jax.vmap(lambda t: lpips_features(vgg, head, t))(btargets)
bts, bopt, w_std = jax.vmap(proj.init_state)(
    jax.random.split(jax.random.PRNGKey(3), B), btargets)
bstep = proj._make_step_batched(w_std[0], False)
vstep = jax.jit(jax.vmap(bstep, in_axes=((0, 0, 0), None, 0, 0)))
bcarry = (bts, bopt, jax.random.split(jax.random.PRNGKey(4), B))

print(f"B={B} REMAT={os.environ.get('REMAT', '0')} TGI_SPLAT={os.environ.get('TGI_SPLAT', 'pack')} compiling...")
t0 = time.time()
out = vstep(bcarry, jnp.asarray(100), btargets, bfeats)
jax.block_until_ready(out[0][0]["w"])
print(f"first run ok {time.time()-t0:.1f}s")
t0 = time.time()
for _ in range(3):
    out = vstep(bcarry, jnp.asarray(100), btargets, bfeats)
    jax.block_until_ready(out[0][0]["w"])
print(f"steady: {(time.time()-t0)/3*1e3:.1f} ms/step")
