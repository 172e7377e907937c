"""Component-level TPU timing for the render/inversion hot path.

Times each stage of the flagship workload (64^2 neural render, 48+48
samples, 256^2 planes, C=32) in isolation on the real chip, plus
microbenchmarks for splat-kernel design alternatives (argsort cost,
one-hot segment-sum matmul). Device-bound timing: chain n dependent
iterations inside one jit so relay dispatch overhead is excluded.

Usage: python scripts/profile_render.py [--section render|splat|micro]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain(fn, *args, n=8, warmup=1):
    """Time fn(*args) device-bound: scan n dependent evals inside one jit.

    fn must accept a scalar perturbation as first arg and return a scalar.
    """
    @jax.jit
    def run(s):
        out, _ = jax.lax.scan(lambda c, _: (fn(c, *args), None), s, None,
                              length=n)
        return out

    for _ in range(warmup):
        float(run(jnp.float32(0)))
    t0 = time.perf_counter()
    float(run(jnp.float32(0)))
    return (time.perf_counter() - t0) / n


def report(name, sec):
    print(f"{name:45s} {sec * 1e3:9.2f} ms")


def section_render():
    from tgi.models import TriPlaneGenerator, GeneratorConfig
    from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                    pack_camera)
    from tgi.render import rays as raymod
    from tgi.render.renderer import run_model, importance_render
    from tgi.render.importance import (merged_march, sample_importance,
                                       sample_stratified)
    from tgi.render.march import mip_ray_marcher

    key = jax.random.PRNGKey(0)
    G = TriPlaneGenerator(GeneratorConfig(fused_dtype="bfloat16"))
    params = G.init(key)
    cam = look_at_pose(np.pi / 2, np.pi / 2, jnp.asarray([0., 0., 0.2]),
                       radius=2.7)
    c = pack_camera(cam[None], fov_to_intrinsics(18.837))
    ws = jnp.zeros((1, G.cfg.num_ws, 512))
    opts = G.cfg.rendering_kwargs

    # Materialize the stage inputs once.
    planes = jax.jit(lambda w: G.backbone_planes(params, w))(ws)
    planes = jax.block_until_ready(planes.astype(jnp.float32))
    nres = G.cfg.neural_rendering_resolution
    intr = fov_to_intrinsics(18.837)
    ro, rd = raymod.ray_sampler(cam[None], intr[None], nres)
    S = opts["depth_resolution"]
    SI = opts["depth_resolution_importance"]
    N, M = ro.shape[0], ro.shape[1]
    print(f"planes {planes.shape} {planes.dtype}; rays {ro.shape}; "
          f"S={S} SI={SI}")

    dec = params["decoder"]

    # -- full synthesis fwd
    report("synthesis fwd (512^2)", chain(
        lambda s: jnp.mean(G.synthesis(params, ws + s, c, det=True)["image"])
        * 1e-6))

    # -- backbone (mapping+synthesis->planes)
    report("backbone planes fwd", chain(
        lambda s: jnp.mean(G.backbone_planes(params, ws + s)
                           .astype(jnp.float32)) * 1e-6))

    # -- full importance render fwd
    def rend(s):
        rgb, d, wsum = importance_render(planes + s, dec, ro, rd, opts,
                                         det=True)
        return jnp.mean(rgb) * 1e-6
    report("importance_render fwd", chain(rend))

    # -- importance render fwd+bwd (d planes)
    def rend_loss(p, s):
        rgb, d, wsum = importance_render(p + s, dec, ro, rd, opts, det=True)
        return jnp.mean(rgb * rgb)
    gfn = jax.grad(rend_loss)
    report("importance_render fwd+bwd(planes)", chain(
        lambda s: jnp.mean(gfn(planes.astype(jnp.float32), s)) * 1e-6))

    # -- run_model (one pass, S samples) fwd
    depths = jax.block_until_ready(jax.jit(
        lambda: sample_stratified(key, ro, 2.25, 3.3, S, det=True))())
    coords = (ro[:, :, None, :] + depths * rd[:, :, None, :]).reshape(N, -1, 3)

    def rm(s):
        out = run_model(planes + s, dec, coords, opts)
        return jnp.mean(out["rgb"]) * 1e-6
    report(f"run_model fwd ({M * S} pts)", chain(rm))

    def rm_loss(p, s):
        out = run_model(p + s, dec, coords, opts)
        return jnp.mean(out["rgb"] ** 2) + jnp.mean(out["sigma"] ** 2)
    rg = jax.grad(rm_loss)
    report("run_model fwd+bwd(planes)", chain(
        lambda s: jnp.mean(rg(planes.astype(jnp.float32), s)) * 1e-6))

    # -- sample_triplanes fwd only
    from tgi.ops import sample_triplanes

    def st(s):
        f = sample_triplanes(planes + s, coords, box_warp=opts["box_warp"])
        return jnp.mean(f.astype(jnp.float32)) * 1e-6
    report("sample_triplanes fwd", chain(st))

    def st_loss(p, s):
        f = sample_triplanes(p + s, coords, box_warp=opts["box_warp"])
        return jnp.mean(f.astype(jnp.float32) ** 2)
    stg = jax.grad(st_loss)
    report("sample_triplanes fwd+bwd", chain(
        lambda s: jnp.mean(stg(planes.astype(jnp.float32), s)) * 1e-6))

    # -- marcher + importance draw + merged march
    out = jax.jit(lambda: run_model(planes, dec, coords, opts))()
    colors = out["rgb"].reshape(N, M, S, -1)
    dens = out["sigma"].reshape(N, M, S, 1)

    def march(s):
        rgb, d, w = mip_ray_marcher(colors + s, dens, depths,
                                    clamp_mode="softplus")
        return jnp.mean(rgb) * 1e-6
    report("mip_ray_marcher", chain(march))

    def imp(s):
        _, _, w = mip_ray_marcher(colors, dens + s, depths,
                                  clamp_mode="softplus")
        df = sample_importance(key, depths, w, SI, det=True)
        return jnp.mean(df) * 1e-6
    report("marcher+sample_importance", chain(imp))

    def mm(s):
        rgb, d, w = merged_march(depths, colors + s, dens, depths + 0.01,
                                 colors, dens, clamp_mode="softplus")
        return jnp.mean(rgb) * 1e-6
    report("merged_march", chain(mm))

    # -- superres
    from tgi.nn.superres import superresolution_apply
    feat = out["rgb"][:, :nres * nres].reshape(N, nres, nres, 32)
    feat = jnp.transpose(feat, (0, 3, 1, 2))
    rgbimg = feat[:, :3]

    def sr(s):
        img = superresolution_apply(
            params["superresolution"], rgbimg + s, feat, ws, G.cfg.sr_cfg,
            use_fp16=True, fused_dtype="bfloat16", sr_antialias=True)
        return jnp.mean(img) * 1e-6
    try:
        report("superres fwd", chain(sr))
    except Exception as e:
        print("superres direct call failed:", type(e).__name__, e)


def section_splat():
    """Current Pallas splat kernel at flagship shape."""
    from tgi.ops.pallas.splat import plane_splat, POINT_BLOCK

    Gp, P, C, H, W = 3, 196608, 32, 256, 256
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    y_top = jax.random.randint(ks[0], (Gp, P), 0, H - 1)
    y_bot = jnp.minimum(y_top + 1, H - 1)
    x = jax.random.randint(ks[1], (Gp, P), 0, W - 1)
    w_top = jax.random.uniform(ks[2], (Gp, P, 2))
    w_bot = jax.random.uniform(ks[3], (Gp, P, 2))
    grads = jax.random.normal(ks[4], (Gp, P, C))

    def f(s):
        o = plane_splat(y_top, y_bot, x, w_top + s, w_bot, grads, H=H, W=W)
        return jnp.mean(o) * 1e-6
    report(f"plane_splat v1 G={Gp} P={P}", chain(f, n=4))

    from tgi.ops.pallas.splat_mxu import plane_splat_mxu
    y0 = jax.random.randint(ks[0], (Gp, P), -1, H)
    x0r = jax.random.randint(ks[1], (Gp, P), -1, W)
    w4 = jax.random.uniform(ks[5], (Gp, P, 4))

    def fm(s):
        o = plane_splat_mxu(y0, x0r, w4 + s, grads, H=H, W=W)
        return jnp.mean(o) * 1e-6
    report(f"plane_splat mxu G={Gp} P={P} (random cells)", chain(fm, n=4))

    # Ray-realistic coherent points: sorted-ish cells (smooth trajectory).
    t = jnp.linspace(0, 1, P)
    yy = (jnp.sin(t * 37.0) * 0.5 + 0.5) * (H - 2)
    xx = (jnp.cos(t * 29.0) * 0.5 + 0.5) * (W - 2)
    y0c = jnp.tile(yy.astype(jnp.int32)[None], (Gp, 1))
    x0c = jnp.tile(xx.astype(jnp.int32)[None], (Gp, 1))

    def fc(s):
        o = plane_splat_mxu(y0c, x0c, w4 + s, grads, H=H, W=W)
        return jnp.mean(o) * 1e-6
    report(f"plane_splat mxu G={Gp} P={P} (coherent)", chain(fc, n=4))


def section_micro():
    """Microbenchmarks for the segment-sum splat redesign."""
    key = jax.random.PRNGKey(0)

    for E in (786432, 2359296):
        keys = jax.random.randint(key, (E,), 0, 65536, dtype=jnp.int32)

        def srt(s):
            k = keys + jnp.int32(s)
            return jnp.sum(jnp.sort(k)) * 1e-9
        report(f"jnp.sort int32 E={E}", chain(srt, n=4))

        def asrt(s):
            k = keys + jnp.int32(s)
            return jnp.sum(jnp.argsort(k)) * 1e-9
        report(f"jnp.argsort int32 E={E}", chain(asrt, n=4))

        vals = jax.random.normal(key, (E, 32))
        idx = jax.random.permutation(key, E)

        def gath(s):
            return jnp.mean(vals[idx] + s) * 1e-6
        report(f"gather [E,32] E={E}", chain(gath, n=4))

    # one-hot segment matmul throughput: [B,Wn] onehot^T @ [B,128]
    B, Wn = 512, 128
    nblk = 4608  # 2.36M entries / 512
    oh = jax.random.normal(key, (nblk, B, Wn), dtype=jnp.bfloat16)
    g4 = jax.random.normal(key, (nblk, B, 128), dtype=jnp.bfloat16)

    def mm(s):
        out = jax.lax.dot_general(
            oh, g4 + jnp.bfloat16(s),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.mean(out) * 1e-6
    report(f"batched ohT@g [{nblk}x{Wn}x{B}x128] bf16", chain(mm, n=4))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all")
    a = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices())
    if a.section in ("all", "render"):
        section_render()
    if a.section in ("all", "splat"):
        section_splat()
    if a.section in ("all", "micro"):
        section_micro()
