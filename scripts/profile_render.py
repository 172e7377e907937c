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
    args are passed as real jit arguments (NOT captured constants — the
    axon remote-compile endpoint rejects >100 MB program bodies).
    """
    @jax.jit
    def run(s, *a):
        out, _ = jax.lax.scan(lambda c, _: (fn(c, *a), None), s, None,
                              length=n)
        return out

    for _ in range(warmup):
        float(run(jnp.float32(0), *args))
    t0 = time.perf_counter()
    float(run(jnp.float32(0), *args))
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
            use_fp16=True, fused_dtype="bfloat16", sr_antialias=True,
            noise_mode="const")
        return jnp.mean(img) * 1e-6
    try:
        report("superres fwd", chain(sr))
    except Exception as e:
        print("superres direct call failed:", type(e).__name__, e)


def section_hot():
    """Quick re-bench of the render hot path after kernel changes."""
    from tgi.models import TriPlaneGenerator, GeneratorConfig
    from tgi.render import rays as raymod
    from tgi.render.cameras import (fov_to_intrinsics, look_at_pose)
    from tgi.render.renderer import importance_render, run_model
    from tgi.render.importance import sample_stratified
    from tgi.ops import sample_triplanes

    key = jax.random.PRNGKey(0)
    G = TriPlaneGenerator(GeneratorConfig(fused_dtype="bfloat16"))
    params = G.init(key)
    cam = look_at_pose(np.pi / 2, np.pi / 2, jnp.asarray([0., 0., 0.2]),
                       radius=2.7)
    planes = jax.jit(lambda w: G.backbone_planes(params, w))(
        jnp.zeros((1, G.cfg.num_ws, 512)))
    planes = jax.block_until_ready(planes.astype(jnp.float32))
    opts = G.cfg.rendering_kwargs
    nres = G.cfg.neural_rendering_resolution
    intr = fov_to_intrinsics(18.837)
    ro, rd = raymod.ray_sampler(cam[None], intr[None], nres)
    S = opts["depth_resolution"]
    N, M = ro.shape[0], ro.shape[1]
    depths = jax.block_until_ready(jax.jit(
        lambda: sample_stratified(key, ro, 2.25, 3.3, S, det=True))())
    coords = (ro[:, :, None, :] + depths * rd[:, :, None, :]).reshape(N, -1, 3)
    layout = (nres, nres, S)
    dec = params["decoder"]

    def st_loss(p, s):
        f = sample_triplanes(p + s, coords, box_warp=opts["box_warp"],
                             point_layout=layout)
        return jnp.mean(f.astype(jnp.float32) ** 2)
    stg = jax.grad(st_loss)
    report("sample_triplanes fwd+bwd (layout)", chain(
        lambda s, p: jnp.mean(stg(p, s)) * 1e-6, planes))

    def st_loss0(p, s):
        f = sample_triplanes(p + s, coords, box_warp=opts["box_warp"])
        return jnp.mean(f.astype(jnp.float32) ** 2)
    stg0 = jax.grad(st_loss0)
    report("sample_triplanes fwd+bwd (no layout)", chain(
        lambda s, p: jnp.mean(stg0(p, s)) * 1e-6, planes))

    def rend_loss(p, s):
        rgb, d, wsum = importance_render(p + s, dec, ro, rd, opts, det=True)
        return jnp.mean(rgb * rgb)
    gfn = jax.grad(rend_loss)
    report("importance_render fwd+bwd(planes)", chain(
        lambda s, p: jnp.mean(gfn(p, s)) * 1e-6, planes))

    # warp loss with the dense small-grid path
    from tgi.losses.warp import calc_warping_loss
    from tgi.models.vgg import vgg16_init, warping_features
    from functools import partial
    vgg = vgg16_init(jax.random.PRNGKey(1))
    target = jnp.zeros((1, 3, 256, 256))
    canon = jnp.zeros((1, 3, 512, 512))
    depth = jnp.full((1, 1, 64, 64), 2.7)
    pred_ext = jnp.asarray(np.eye(4, dtype=np.float32))[None]
    init_ext = jnp.asarray(np.eye(4, dtype=np.float32))[None]
    intrinsic = jnp.asarray(
        [[[4.2647, 0, 0.5], [0, 4.2647, 0.5], [0, 0, 1]]], jnp.float32)

    def warp_loss_fn(c, s):
        loss, _ = calc_warping_loss(
            c + s, partial(warping_features, vgg), pred_ext,
            init_ext, intrinsic, depth, target)
        return loss
    wlg = jax.grad(warp_loss_fn)
    report("calc_warping_loss fwd+bwd", chain(
        lambda s, c: jnp.mean(wlg(c, s)) * 1e-6, canon))


def section_stage1():
    """Stage-1 step decomposition: which loss term / update eats the
    371 ms."""
    from tgi.models import TriPlaneGenerator, GeneratorConfig
    from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                    pack_camera)
    from tgi.invert import Projector, ProjectorConfig
    from tgi.models.pose_resnet import resnet34_init, resnet34_apply
    from tgi.models.vgg import (lpips_features, lpips_head_init, vgg16_init,
                                warping_features)

    key = jax.random.PRNGKey(0)
    G = TriPlaneGenerator(GeneratorConfig(fused_dtype="bfloat16"))
    params = G.init(key)
    kv, kh, kp = jax.random.split(key, 3)
    vgg = vgg16_init(kv)
    head = lpips_head_init(kh)
    pose = resnet34_init(kp, output_dims=4)
    target = jnp.zeros((1, 3, 256, 256))

    # pose net fwd+bwd
    pg = jax.grad(lambda p, s: jnp.sum(resnet34_apply(p, target + s) ** 2))
    report("pose resnet34 fwd+bwd", chain(
        lambda s: jnp.mean(pg(pose, s)["conv1"]["weight"]) * 1e-6))

    # lpips features fwd+bwd wrt image
    lg = jax.grad(lambda img, s: jnp.sum(
        lpips_features(vgg, head, img + s) ** 2))
    report("vgg lpips_features 256 fwd+bwd", chain(
        lambda s: jnp.mean(lg(target, s)) * 1e-6))

    # warp features fwd+bwd
    wg = jax.grad(lambda img, s: jnp.sum(
        warping_features(vgg, img + s) ** 2))
    report("vgg warping_features 256 fwd+bwd", chain(
        lambda s: jnp.mean(wg(target, s)) * 1e-6))

    # full projector loss fwd+bwd and full step
    proj = Projector(G, params, vgg, head, pose,
                     ProjectorConfig(w_avg_samples=256))
    from tgi.models.vgg import lpips_features as lf
    tfeats = lf(vgg, head, target)
    ts, opt_states, w_std = proj.init_state(jax.random.PRNGKey(1), target)
    grad_fn = jax.grad(proj._loss, has_aux=True)

    def lossg(s, ts_):
        g2, _ = grad_fn(ts_, target + s, tfeats, jnp.zeros_like(ts_["w"]),
                        jax.random.PRNGKey(2))
        return jnp.mean(g2["w"]) * 1e-6
    report("projector _loss fwd+bwd", chain(lossg, ts, n=4))

    # warping loss fwd+bwd (canonical render held fixed)
    from tgi.losses.warp import calc_warping_loss
    from functools import partial
    canon = jnp.zeros((1, 3, 512, 512))
    depth = jnp.full((1, 1, 64, 64), 2.7)
    pred_ext = jnp.asarray(np.eye(4, dtype=np.float32))[None]

    def warp_loss_fn(c, s):
        loss, _ = calc_warping_loss(
            c + s, partial(warping_features, vgg), pred_ext,
            proj.init_ext, proj.intrinsic[None], depth, target)
        return loss
    wlg = jax.grad(warp_loss_fn)
    report("calc_warping_loss fwd+bwd", chain(
        lambda s: jnp.mean(wlg(canon, s)) * 1e-6))

    # True per-step cost: the projector's own scan with a REAL carry (no
    # loop-invariant hoisting possible).
    step = proj._make_step(target, tfeats, w_std, preheat=False)
    nsteps = 8

    @jax.jit
    def scan_steps(ts_, os_):
        carry = (ts_, os_, jax.random.PRNGKey(3))
        carry, m = jax.lax.scan(step, carry, jnp.arange(60, 60 + nsteps))
        return carry[0]["w"]

    t0 = time.time()
    jax.block_until_ready(scan_steps(ts, opt_states))
    print(f"  (stage1 scan compile+run: {time.time() - t0:.1f}s)")
    t0 = time.time()
    jax.block_until_ready(scan_steps(ts, opt_states))
    report("full stage1 step (real scan)", (time.time() - t0) / nsteps)


def section_stage2():
    """Stage-2 PTI step decomposition."""
    from tgi.models import TriPlaneGenerator, GeneratorConfig
    from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                    pack_camera)
    from tgi.invert import PTICoach, CoachConfig
    from tgi.losses.lpips import AlexLPIPSLoss, LPIPSLoss

    key = jax.random.PRNGKey(0)
    G = TriPlaneGenerator(GeneratorConfig(fused_dtype="bfloat16"))
    params = G.init(key)
    cam = look_at_pose(np.pi / 2, np.pi / 2, jnp.asarray([0., 0., 0.2]),
                       radius=2.7)
    c = pack_camera(cam[None], fov_to_intrinsics(18.837))
    ws = jnp.zeros((1, G.cfg.num_ws, 512))
    real = jnp.zeros((1, 3, 512, 512))

    # synthesis fwd+bwd wrt params (the stage-2 render cost incl SR)
    def synth_loss(p, s):
        out = G.synthesis(p, ws + s, c, det=False, key=jax.random.PRNGKey(1))
        return jnp.mean(out["image"] ** 2)
    sg = jax.grad(synth_loss)
    report("synthesis fwd+bwd(params) 512", chain(
        lambda s, p: jnp.mean(sg(p, s)["decoder"]["net0"]["weight"]) * 1e-6,
        params, n=4))

    for name, lp in (("alex", AlexLPIPSLoss(key=key)),
                     ("vgg", LPIPSLoss(key=key))):
        def lp_loss(img, s):
            return jnp.sum(lp.from_unit(img + s, real))
        lg = jax.grad(lp_loss)
        report(f"lpips[{name}] 512 fwd+bwd", chain(
            lambda s, im: jnp.mean(lg(im, s)) * 1e-6, real))

    # full coach loss fwd+bwd
    lp = AlexLPIPSLoss(key=key)
    coach = PTICoach(G, lp, CoachConfig())
    gf = jax.grad(coach._loss, has_aux=True)

    def cg(s, p):
        g2, _ = gf(p, ws + s, c, real, jax.random.PRNGKey(2))
        return jnp.mean(g2["decoder"]["net0"]["weight"]) * 1e-6
    report("coach _loss fwd+bwd (full stage2 core)", chain(cg, params, n=4))


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

    # pack kernel: realistic block-local pattern — each 512-entry block a
    # random ~36x36 patch (one 8x8 ray tile over 8 depth slices).
    from tgi.ops.pallas.splat_pack import plane_splat_pack
    rng = np.random.RandomState(0)
    nblk = P // 512
    by = rng.randint(0, H - 40, (Gp, nblk))
    bx = rng.randint(0, W - 40, (Gp, nblk))
    oy = rng.randint(0, 36, (Gp, nblk, 512))
    ox = rng.randint(0, 36, (Gp, nblk, 512))
    y0p = jnp.asarray((by[..., None] + oy).reshape(Gp, P), jnp.int32)
    x0p = jnp.asarray((bx[..., None] + ox).reshape(Gp, P), jnp.int32)

    def fp(s):
        o = plane_splat_pack(y0p, x0p, w4 + s, grads, H=H, W=W)
        return jnp.mean(o) * 1e-6
    report(f"plane_splat pack G={Gp} P={P} (block-local)", chain(fp, n=4))

    def fpr(s):
        o = plane_splat_pack(y0, x0r, w4 + s, grads, H=H, W=W)
        return jnp.mean(o) * 1e-6
    report(f"plane_splat pack G={Gp} P={P} (random)", chain(fpr, n=4))

    # realistic end-to-end: sample_triplanes fwd+bwd with the pack kernel
    # is measured via section_render under TGI_SPLAT=pack.


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

    def mm(s):
        oh = jax.random.normal(jax.random.PRNGKey(1), (nblk, B, Wn),
                               dtype=jnp.bfloat16)
        g4 = jax.random.normal(jax.random.PRNGKey(2), (nblk, B, 128),
                               dtype=jnp.bfloat16)
        out = jax.lax.dot_general(
            oh, g4 + s.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.mean(out) * 1e-6
    report(f"batched ohT@g [{nblk}x{Wn}x{B}x128] bf16", chain(mm, n=4))

    # gather variants at splat-prep scale
    E = 786432
    vals = jax.random.normal(key, (3, E, 32))
    idx = jax.random.randint(key, (3, E), 0, E)

    def gb(s):
        out = jnp.take_along_axis(vals + s, idx[..., None], axis=1)
        return jnp.mean(out) * 1e-6
    report("take_along_axis [3,E,32]", chain(gb, n=4))

    key_srt = jax.random.randint(key, (3, E), 0, 65536, dtype=jnp.int32)

    def bsrt(s):
        k = key_srt + jnp.int32(s)
        return jnp.sum(jnp.argsort(k, axis=-1)) * 1e-9
    report("argsort [3,E] batched", chain(bsrt, n=4))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all")
    a = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices())
    if a.section == "stage2":
        section_stage2()
    if a.section == "hot":
        section_hot()
    if a.section in ("all", "render"):
        section_render()
    if a.section in ("all", "stage1"):
        section_stage1()
    if a.section in ("all", "splat"):
        section_splat()
    if a.section in ("all", "micro"):
        section_micro()
