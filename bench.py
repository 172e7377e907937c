"""TPU benchmark: the reference's headline workload costs (BASELINE.md).

Measures, on the real chip, with the full-size FFHQ-512 architecture
(8XDC super-resolution, 48+48 depth samples, 64² neural render — random
init; wall-clock does not depend on weight values):

  * 512² novel-view render ms/frame (gen_videos hot loop, SURVEY.md 3.4)
  * stage-1 projection step ms (2 renders + backward + 3 Adam updates)
  * stage-2 PTI step ms (render + LPIPS/L2/TV backward + Adam)
  * extrapolated PTI inversion sec/image at the reference step budget
    (400 stage-1 + 400 stage-2, hyperparameters.py:19-22)

Prints ONE JSON line. ``vs_baseline`` compares the extrapolated
sec/image against REFERENCE_SEC_PER_IMAGE — the RTX 3090 wall-clock of
the reference implementation for the same budget (no number is published
in the repo; 180 s/image is our measured-workload estimate: ~800
fwd+bwd of the full generator at 512², plus 400 LPIPS/VGG evals, on a
3090 — see BASELINE.md).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache (executables keyed by program+compiler
# version): the stage-1/stage-2 scans are multi-minute compiles through
# the axon relay; cache them across bench runs. Kept out of git — unlike
# the CPU test cache, TPU executables are chip/runtime specific.
_cache = os.environ.get("TGI_BENCH_CACHE", "/root/.cache/tgi_tpu_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

REFERENCE_SEC_PER_IMAGE = 180.0
STAGE1_STEPS = 400
STAGE2_STEPS = 400


def timeit(fn, *args, warmup=2, iters=8):
    """Wall-clock with a device sync every iteration (the axon relay can
    otherwise report async dispatch time, not execution time)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def timeit_chained(render_scalar_fn, n=10):
    """Device-bound timing: chain n dependent evaluations inside one jit
    (excludes per-call host/relay overhead)."""
    @jax.jit
    def run(s):
        out, _ = jax.lax.scan(lambda s, _: (render_scalar_fn(s), None), s,
                              None, length=n)
        return out
    float(run(jnp.float32(0)))
    t0 = time.perf_counter()
    float(run(jnp.float32(0)))
    return (time.perf_counter() - t0) / n


def main():
    from tgi.models import TriPlaneGenerator, GeneratorConfig
    from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                    pack_camera)
    from tgi.invert import Projector, ProjectorConfig, PTICoach, CoachConfig
    from tgi.losses.lpips import AlexLPIPSLoss
    from tgi.models.pose_resnet import resnet34_init
    from tgi.models.vgg import lpips_head_init, vgg16_init

    dev = jax.devices()[0]
    key = jax.random.PRNGKey(0)
    G = TriPlaneGenerator(GeneratorConfig(fused_dtype="bfloat16"))
    params = G.init(key)

    cam = look_at_pose(np.pi / 2, np.pi / 2, jnp.asarray([0., 0., 0.2]),
                       radius=2.7)
    c = pack_camera(cam[None], fov_to_intrinsics(18.837))
    ws = jnp.zeros((1, G.cfg.num_ws, 512))

    # 1) 512² render (gen_videos inner loop), device-bound.
    def render_scalar(s):
        return jnp.mean(G.synthesis(params, ws + s, c,
                                    det=True)["image"]) * 1e-6

    render_ms = timeit_chained(render_scalar, n=10) * 1e3

    # bf16 render LPIPS-neutrality: the projector/coach render in the
    # generator's native bf16 on TPU (reference forces fp32 as a CUDA
    # fp16-stability guard, w_projector.py:189); check the outputs are
    # perceptually identical before benchmarking the bf16 path.
    from tgi.losses.lpips import AlexLPIPSLoss
    lp_check = AlexLPIPSLoss(key=jax.random.PRNGKey(7))
    img16 = jax.jit(lambda: G.synthesis(params, ws, c, det=True)["image"])()
    img32 = jax.jit(lambda: G.synthesis(params, ws, c, det=True,
                                        force_fp32=True)["image"])()
    bf16_lpips = float(lp_check.from_unit(img16, img32)[0])

    # 2) stage-1 projection step (bf16 renders).
    kv, kh, kp = jax.random.split(key, 3)
    vgg = vgg16_init(kv)
    head = lpips_head_init(kh)
    pose = resnet34_init(kp, output_dims=4)
    proj = Projector(G, params, vgg, head, pose,
                     ProjectorConfig(w_avg_samples=512, render_fp32=False))
    target = jnp.zeros((1, 3, 256, 256))
    from tgi.models.vgg import lpips_features
    tfeats = lpips_features(vgg, head, target)
    ts, opt_states, w_std = proj.init_state(jax.random.PRNGKey(1), target)
    step_b = proj._make_step(target, tfeats, w_std, preheat=False)

    # The real pipeline runs 400 steps inside ONE lax.scan
    # (Projector.project) — a single dispatch. Timing per-call through
    # the axon relay adds ~100 ms of round-trip per step that the real
    # loop never pays, so measure a fused scan and divide.
    NS1 = 16

    @jax.jit
    def scan_stage1(ts_, os_):
        carry = (ts_, os_, jax.random.PRNGKey(2))
        carry, _ = jax.lax.scan(step_b, carry, jnp.arange(60, 60 + NS1))
        return carry[0]["w"]

    stage1_ms = timeit(lambda: scan_stage1(ts, opt_states),
                       warmup=1, iters=3) * 1e3 / NS1

    # 3) stage-2 PTI step (AlexNet-LPIPS, hyperparameters.py:2 parity) —
    # same scan shape as PTICoach.tune's on-device while_loop.
    import optax
    lp = AlexLPIPSLoss(key=jax.random.PRNGKey(5))
    coach = PTICoach(G, lp, CoachConfig())
    real = jnp.zeros((1, 3, 512, 512))
    NS2 = 12

    opt_state0 = jax.jit(coach.opt.init)(params)

    @jax.jit
    def scan_stage2(p, opt_state):
        def body(carry, _):
            pp, os_, k = carry
            k, kk = jax.random.split(k)
            g, _ = jax.grad(coach._loss, has_aux=True)(pp, ws, c, real, kk)
            upd, os_ = coach.opt.update(g, os_, pp)
            return (optax.apply_updates(pp, upd), os_, k), None

        carry, _ = jax.lax.scan(
            body, (p, opt_state, jax.random.PRNGKey(3)), None, length=NS2)
        return carry[0]["decoder"]["net0"]["weight"]

    stage2_ms = timeit(lambda: scan_stage2(params, opt_state0),
                       warmup=1, iters=3) * 1e3 / NS2

    sec_per_image = (STAGE1_STEPS * stage1_ms
                     + STAGE2_STEPS * stage2_ms) / 1e3

    # 3b) The reference README stages ffhqrebalanced512-128.pkl — same
    # architecture and weights shapes, but neural_rendering_resolution=128
    # as a pickled attribute (4x the rays; the raw 64² render is otherwise
    # bilinearly lifted to the SR's 128 input, superresolution.py:48-51).
    # Measure the same steps at that ray count so the bench covers the
    # shipped checkpoint's exact workload (BASELINE.md "Ray-count note").
    import dataclasses
    import os as _os
    extra128 = {}
    if _os.environ.get("TGI_BENCH_128", "1") == "1":
        G128 = TriPlaneGenerator(dataclasses.replace(
            G.cfg, neural_rendering_resolution=128))
        proj128 = Projector(G128, params, vgg, head, pose,
                            ProjectorConfig(w_avg_samples=512,
                                            render_fp32=False))
        step128 = proj128._make_step(target, tfeats, w_std, preheat=False)

        @jax.jit
        def scan_stage1_128(ts_, os_):
            carry = (ts_, os_, jax.random.PRNGKey(2))
            carry, _ = jax.lax.scan(step128, carry,
                                    jnp.arange(60, 60 + NS1))
            return carry[0]["w"]

        s1_128 = timeit(lambda: scan_stage1_128(ts, opt_states),
                        warmup=1, iters=3) * 1e3 / NS1

        coach128 = PTICoach(G128, lp, CoachConfig())

        @jax.jit
        def scan_stage2_128(p, opt_state):
            def body(carry, _):
                pp, os_, k = carry
                k, kk = jax.random.split(k)
                g, _ = jax.grad(coach128._loss, has_aux=True)(
                    pp, ws, c, real, kk)
                upd, os_ = coach128.opt.update(g, os_, pp)
                return (optax.apply_updates(pp, upd), os_, k), None

            carry, _ = jax.lax.scan(
                body, (p, opt_state, jax.random.PRNGKey(3)), None,
                length=NS2)
            return carry[0]["decoder"]["net0"]["weight"]

        s2_128 = timeit(lambda: scan_stage2_128(params, opt_state0),
                        warmup=1, iters=3) * 1e3 / NS2
        extra128 = {
            "stage1_step_ms_128rays": round(s1_128, 2),
            "stage2_step_ms_128rays": round(s2_128, 2),
            "sec_per_image_128rays": round(
                (STAGE1_STEPS * s1_128 + STAGE2_STEPS * s2_128) / 1e3, 2),
        }

    # 4) Self-inversion quality gate: invert a G-generated target with
    # known (w*, cam*) through the REAL full-budget pipeline
    # (Projector.project 400 steps -> PTICoach.tune <=400 steps with the
    # 0.06 early stop). MS-SSIM/MSE/pose error are weight-free; LPIPS
    # uses the same (random-init) backbones as the timing runs, so its
    # value demonstrates convergence + the early-stop mechanism, not the
    # calibrated perceptual scale (that needs pretrained weights).
    from tgi.invert import self_inversion_eval
    import os
    selfinv = {}
    if os.environ.get("TGI_BENCH_SELFINV", "1") == "1":
        q = self_inversion_eval(
            G, params, key=jax.random.PRNGKey(42), vgg_params=vgg,
            lpips_head=head, pose_params=pose, lpips_loss=lp,
            first_inv_steps=STAGE1_STEPS, max_pti_steps=STAGE2_STEPS)
        selfinv = {
            "selfinv_final_lpips": round(q["final_lpips"], 4),
            "selfinv_final_ms_ssim": round(q["final_ms_ssim"], 4),
            "selfinv_final_mse": round(q["final_mse"], 5),
            "selfinv_pivot_ms_ssim": round(q["pivot_ms_ssim"], 4),
            "selfinv_pose_err_deg": round(q["pose_err_deg"], 2),
            "selfinv_pti_steps": q["pti_steps"],
        }

    # 5) Quality-gated fast mode (PERF.md "paths past the ceiling" (c)):
    # 32+32 depth samples instead of the reference's 48+48
    # (rendering_kwargs, triplane.py defaults). The sampling machinery
    # (gather fwd + splat bwd) scales linearly with the point count, so
    # this trades FLOPs the quality gate can actually measure: the fast
    # self-inversion below runs the SAME full-budget pipeline at the
    # SAME seed as section 4, making fast_selfinv_* directly comparable
    # to selfinv_* — "matched LPIPS/ID" per BASELINE.md's north star,
    # demonstrated rather than assumed. Parity-settings numbers above
    # remain the headline.
    fast = {}
    if os.environ.get("TGI_BENCH_FAST", "1") == "1":
        Gfast = TriPlaneGenerator(G.cfg.with_rendering(
            depth_resolution=32, depth_resolution_importance=32))
        projf = Projector(Gfast, params, vgg, head, pose,
                          ProjectorConfig(w_avg_samples=512,
                                          render_fp32=False))
        stepf = projf._make_step(target, tfeats, w_std, preheat=False)

        @jax.jit
        def scan_stage1_fast(ts_, os_):
            carry = (ts_, os_, jax.random.PRNGKey(2))
            carry, _ = jax.lax.scan(stepf, carry,
                                    jnp.arange(60, 60 + NS1))
            return carry[0]["w"]

        s1_fast = timeit(lambda: scan_stage1_fast(ts, opt_states),
                         warmup=1, iters=3) * 1e3 / NS1

        coachf = PTICoach(Gfast, lp, CoachConfig())

        @jax.jit
        def scan_stage2_fast(p, opt_state):
            def body(carry, _):
                pp, os_, k = carry
                k, kk = jax.random.split(k)
                g, _ = jax.grad(coachf._loss, has_aux=True)(
                    pp, ws, c, real, kk)
                upd, os_ = coachf.opt.update(g, os_, pp)
                return (optax.apply_updates(pp, upd), os_, k), None

            carry, _ = jax.lax.scan(
                body, (p, opt_state, jax.random.PRNGKey(3)), None,
                length=NS2)
            return carry[0]["decoder"]["net0"]["weight"]

        s2_fast = timeit(lambda: scan_stage2_fast(params, opt_state0),
                         warmup=1, iters=3) * 1e3 / NS2
        fast_sec = (STAGE1_STEPS * s1_fast + STAGE2_STEPS * s2_fast) / 1e3
        fast = {
            "fast_stage1_step_ms": round(s1_fast, 2),
            "fast_stage2_step_ms": round(s2_fast, 2),
            "fast_sec_per_image": round(fast_sec, 2),
            "fast_vs_baseline": round(REFERENCE_SEC_PER_IMAGE / fast_sec,
                                      2),
        }
        if os.environ.get("TGI_BENCH_SELFINV", "1") == "1":
            from tgi.invert import self_inversion_eval as _sie
            # target_G=G: the target is rendered at the PARITY sampling
            # settings (48+48) and inverted by the FAST pipeline — the
            # real-world question (fast machinery vs full-fidelity
            # image), not a softer fast-vs-fast round trip.
            qf = _sie(Gfast, params, key=jax.random.PRNGKey(42),
                      vgg_params=vgg, lpips_head=head, pose_params=pose,
                      lpips_loss=lp, first_inv_steps=STAGE1_STEPS,
                      max_pti_steps=STAGE2_STEPS, target_G=G)
            fast.update({
                "fast_selfinv_final_lpips": round(qf["final_lpips"], 4),
                "fast_selfinv_final_ms_ssim": round(qf["final_ms_ssim"],
                                                    4),
                "fast_selfinv_final_mse": round(qf["final_mse"], 5),
                "fast_selfinv_pose_err_deg": round(qf["pose_err_deg"], 2),
                "fast_selfinv_pti_steps": qf["pti_steps"],
            })

    print(json.dumps({
        "metric": "PTI inversion sec/image (w+pose, 400+400 steps)",
        "value": round(sec_per_image, 2),
        "unit": "s/image",
        "vs_baseline": round(REFERENCE_SEC_PER_IMAGE / sec_per_image, 2),
        # Bracketed reference denominator (BASELINE.md): the 180 s
        # center is a per-op cost model of the reference loop on a 3090;
        # the range is its pessimistic/optimistic bound.
        "baseline_sec_range": [120.0, 240.0],
        "vs_baseline_range": [round(120.0 / sec_per_image, 2),
                              round(240.0 / sec_per_image, 2)],
        "render_ms_per_frame_512": round(render_ms, 2),
        "stage1_step_ms": round(stage1_ms, 2),
        "stage2_step_ms": round(stage2_ms, 2),
        "bf16_render_lpips_vs_fp32": round(bf16_lpips, 4),
        **extra128,
        **selfinv,
        **fast,
        "device": str(dev),
    }))


if __name__ == "__main__":
    main()
