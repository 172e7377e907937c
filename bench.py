"""TPU benchmark: the reference's headline workload costs (BASELINE.md).

Measures, on the real chip, with the full-size FFHQ-512 architecture
(8XDC super-resolution, 48+48 depth samples, 64² neural render — random
init; wall-clock does not depend on weight values):

  * 512² novel-view render ms/frame (gen_videos hot loop, SURVEY.md 3.4)
  * stage-1 projection step ms (2 renders + backward + 3 Adam updates)
  * stage-2 PTI step ms (render + LPIPS/L2/TV backward + Adam)
  * extrapolated PTI inversion sec/image at the reference step budget
    (400 stage-1 + 400 stage-2, hyperparameters.py:19-22)

The HEADLINE JSON line (metric/value/unit/vs_baseline + step timings) is
printed and flushed as soon as sections 1-3 finish; optional sections
(self-inversion quality gate, batched inversion, fast mode, 128-ray)
then run under an internal wall-clock budget (``TGI_BENCH_BUDGET_S``,
default 1200 s; 0 = unlimited) — a section whose worst-case-cold
estimate exceeds the remaining budget is skipped and named in
``skipped_sections`` — and a final merged JSON line repeats the headline
plus everything that ran. Worst-case-cold (empty compile cache) the run
self-bounds instead of starving the headline (round-3 failure mode).

``vs_baseline`` compares the extrapolated sec/image against
REFERENCE_SEC_PER_IMAGE — the RTX 3090 wall-clock of the reference
implementation for the same budget (no number is published in the repo;
180 s/image is our measured-workload estimate: ~800 fwd+bwd of the full
generator at 512², plus 400 LPIPS/VGG evals, on a 3090 — see
BASELINE.md).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tgi.bench_util import setup_compile_cache

setup_compile_cache()

REFERENCE_SEC_PER_IMAGE = 180.0
STAGE1_STEPS = 400
STAGE2_STEPS = 400
NS1 = 16          # stage-1 steps fused per timing scan
NS2 = 12          # stage-2 steps fused per timing scan
# TPU v5e (lite) peak: 197 TFLOP/s bf16 / 394 TOPS int8 per chip. MFU is
# reported against the bf16 peak — conservative for this pipeline, whose
# render/decoder segments run fp32 accumulation (half the bf16 rate), so
# true utilization of the attainable roofline is higher than mfu_pct.
V5E_PEAK_FLOPS = 197e12


def compiled_flops(jitted, *args):
    """Exact FLOP count of a compiled program via XLA cost analysis
    (verified live on the axon TPU backend). Returns None if the backend
    doesn't expose it — callers treat MFU as best-effort."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:  # noqa: BLE001 — diagnostics only
        return None


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


class SectionBudget:
    """Internal wall-clock budget: optional sections only start when
    their worst-case-cold estimate fits the remaining window, so the
    process always exits in-window with both JSON lines printed."""

    def __init__(self, total_s):
        self.t0 = time.perf_counter()
        self.total = total_s
        self.skipped = []
        self.failed = []
        self.section_s = {}

    def elapsed(self):
        return time.perf_counter() - self.t0

    def allow(self, name, est_s):
        if self.total <= 0:
            return True
        remaining = self.total - self.elapsed()
        if remaining >= est_s:
            return True
        self.skipped.append(
            f"{name} (worst-case-cold est {est_s:.0f}s > {remaining:.0f}s "
            "left)")
        return False

    def run(self, name, fn):
        """Run an optional section; a failure (e.g. a TPU-worker/relay
        crash mid-section, CLAUDE.md "More environment traps") is
        recorded in the final JSON instead of killing the process — the
        headline already flushed and the exit code must stay 0 for the
        driver record. After two failures the backend is presumed dead
        and the remaining sections are skipped outright."""
        if len(self.failed) >= 2:
            self.skipped.append(f"{name} (backend presumed dead after "
                                f"{len(self.failed)} section failures)")
            return False
        t0 = time.perf_counter()
        try:
            fn()
            return True
        except Exception as e:  # noqa: BLE001 — driver-facing resilience
            msg = str(e).split("\n")[0][:200]
            self.failed.append(f"{name}: {type(e).__name__}: {msg}")
            import traceback
            traceback.print_exc()
            return False
        finally:
            # Recorded in the final JSON: calibrates the worst-case-cold
            # estimates `allow` gates on (round-3 lesson — estimates that
            # undershoot cold compiles let the run blow the window).
            self.section_s[name] = round(time.perf_counter() - t0, 1)


def measure_stage_steps(G_var, *, params, ws, c, real, target, tfeats, ts,
                        opt_states, w_std, vgg, head, pose, lp,
                        proj_overrides=None, with_flops=False):
    """(stage-1 step ms, stage-2 step ms[, per-step FLOPs dict]) for a
    generator variant.

    The real pipeline runs its 400 steps inside ONE lax.scan — a single
    dispatch. Timing per-call through the axon relay adds ~100 ms of
    round-trip per step that the real loop never pays, so measure a
    fused scan and divide. Shared by the parity, 128-ray, and fast-mode
    sections (they differ only in the generator's rendering config /
    ``proj_overrides`` like canon_sr_max_res).
    """
    import dataclasses

    import optax

    from tgi.invert import CoachConfig, PTICoach, Projector, ProjectorConfig

    pcfg = ProjectorConfig(w_avg_samples=512, render_fp32=False)
    if proj_overrides:
        pcfg = dataclasses.replace(pcfg, **proj_overrides)
    proj = Projector(G_var, params, vgg, head, pose, pcfg)
    step = proj._make_step(target, tfeats, w_std, preheat=False)

    @jax.jit
    def scan_stage1(ts_, os_):
        carry = (ts_, os_, jax.random.PRNGKey(2))
        carry, _ = jax.lax.scan(step, carry, jnp.arange(60, 60 + NS1))
        return carry[0]["w"]

    s1_ms = timeit(lambda: scan_stage1(ts, opt_states),
                   warmup=1, iters=3) * 1e3 / NS1

    coach = PTICoach(G_var, lp, CoachConfig())
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

    s2_ms = timeit(lambda: scan_stage2(params, opt_state0),
                   warmup=1, iters=3) * 1e3 / NS2
    if not with_flops:
        return s1_ms, s2_ms
    # XLA's HloCostAnalysis counts a while/scan BODY once, independent of
    # trip count (verified on both the CPU and axon TPU backends: a
    # length-1 and length-16 matmul scan report identical flops). The
    # scan program's count therefore already IS the per-step figure — do
    # NOT divide by NS (the round-4 bench did, under-reporting MFU ~16x).
    f1 = compiled_flops(scan_stage1, ts, opt_states)
    f2 = compiled_flops(scan_stage2, params, opt_state0)
    flops = {"stage1": f1, "stage2": f2}
    return s1_ms, s2_ms, flops


def measure_batched_stage1(G, *, params, vgg, head, pose, B, ns=8):
    """Stage-1 step ms PER IMAGE with B images inverted simultaneously
    (Projector.project_batch semantics: per-image w/noise/pose/Adam
    states vmapped, frozen generator shared so the convs batch on the
    MXU; remat_render bounds the B x two-view residual memory)."""
    from tgi.invert import Projector, ProjectorConfig
    from tgi.models.vgg import lpips_features

    proj = Projector(G, params, vgg, head, pose,
                     ProjectorConfig(w_avg_samples=512, render_fp32=False,
                                     remat_render=True))
    targets = jax.random.uniform(jax.random.PRNGKey(21),
                                 (B, 1, 3, 256, 256), maxval=255.0)
    tfeats = jax.vmap(lambda t: lpips_features(vgg, head, t))(targets)
    ts, opt_states, w_std = jax.vmap(proj.init_state)(
        jax.random.split(jax.random.PRNGKey(22), B), targets)
    keys = jax.random.split(jax.random.PRNGKey(23), B)

    step = proj._make_step_batched(w_std[0], preheat=False)
    vstep = jax.vmap(step, in_axes=((0, 0, 0), None, 0, 0))

    @jax.jit
    def scan(ts_, os_, keys_, targets_, tfeats_):
        def body(carry, i):
            carry, _ = vstep(carry, i, targets_, tfeats_)
            return carry, None
        carry, _ = jax.lax.scan(body, (ts_, os_, keys_),
                                jnp.arange(60, 60 + ns))
        return carry[0]["w"]

    t = timeit(lambda: scan(ts, opt_states, keys, targets, tfeats),
               warmup=1, iters=3)
    return t * 1e3 / ns / B


def measure_batched_stage2(G, *, params, ws, c, lp, B, ns=6):
    """Stage-2 step ms PER IMAGE with B per-image generator copies tuned
    simultaneously (PTICoach.tune_batch semantics: weights diverge per
    image, vmapped convs batch the B copies on the MXU; remat bounds the
    B x 512^2 activation memory)."""
    import optax

    from tgi.invert import CoachConfig, PTICoach

    coach = PTICoach(G, lp, CoachConfig(remat=True))
    ws_b = jnp.tile(ws[None], (B, 1, 1, 1))
    c_b = jnp.tile(c[None], (B, 1, 1))
    real_b = jnp.zeros((B, 1, 3, 512, 512))

    def one_step(p, os_, k, w, cc, t):
        g, _ = jax.grad(coach._loss, has_aux=True)(p, w, cc, t, k)
        upd, os_ = coach.opt.update(g, os_, p)
        return optax.apply_updates(p, upd), os_

    vstep = jax.vmap(one_step)
    params_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), params)
    opt_b = jax.vmap(coach.opt.init)(params_b)

    @jax.jit
    def scan(pb, ob, key):
        def body(carry, _):
            pb, ob, k = carry
            k, kk = jax.random.split(k)
            pb, ob = vstep(pb, ob, jax.random.split(kk, B), ws_b, c_b,
                           real_b)
            return (pb, ob, k), None
        carry, _ = jax.lax.scan(body, (pb, ob, key), None, length=ns)
        return carry[0]["decoder"]["net0"]["weight"]

    t = timeit(lambda: scan(params_b, opt_b, jax.random.PRNGKey(3)),
               warmup=1, iters=3)
    return t * 1e3 / ns / B


def main():
    import optax

    from tgi.models import TriPlaneGenerator, GeneratorConfig
    from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                    pack_camera)
    from tgi.invert import Projector, ProjectorConfig
    from tgi.losses.lpips import AlexLPIPSLoss
    from tgi.models.pose_resnet import resnet34_init
    from tgi.models.vgg import lpips_features, lpips_head_init, vgg16_init

    # 2400 s default: headline sections cold are ~25 min; the optional
    # sections are gated so the LAST allowed section starting right at
    # the budget edge still leaves the total around the driver window
    # (~1h). Sections are ordered by evidential priority: selfinv
    # quality gate > fast-mode pair > batched > 128-ray.
    budget = SectionBudget(float(os.environ.get("TGI_BENCH_BUDGET_S",
                                                "2400")))
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
    lp_check = AlexLPIPSLoss(key=jax.random.PRNGKey(7))
    img16 = jax.jit(lambda: G.synthesis(params, ws, c, det=True)["image"])()
    img32 = jax.jit(lambda: G.synthesis(params, ws, c, det=True,
                                        force_fp32=True)["image"])()
    bf16_lpips = float(lp_check.from_unit(img16, img32)[0])

    # 2-3) stage-1 / stage-2 step costs at parity settings (bf16 renders).
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
    stage1_ms, stage2_ms, step_flops = measure_stage_steps(
        G, **shared, with_flops=True)
    sec_per_image = (STAGE1_STEPS * stage1_ms
                     + STAGE2_STEPS * stage2_ms) / 1e3

    def mfu(flops, ms):
        if not flops or not ms:
            return None
        return round(100.0 * flops / (ms / 1e3) / V5E_PEAK_FLOPS, 1)

    headline = {
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
        # Hardware utilization: exact XLA-counted FLOPs of the compiled
        # step over measured time, vs the chip's 197 TFLOP/s bf16 peak
        # (a conservative denominator — fp32-accum segments peak at half
        # that). Low MFU here is structural: the hot kernels are the
        # memory-bound tri-plane gather/splat (PERF.md), not matmuls.
        "stage1_mfu_pct": mfu(step_flops["stage1"], stage1_ms),
        "stage2_mfu_pct": mfu(step_flops["stage2"], stage2_ms),
        "stage1_step_gflops": step_flops["stage1"] and round(
            step_flops["stage1"] / 1e9, 1),
        "stage2_step_gflops": step_flops["stage2"] and round(
            step_flops["stage2"] / 1e9, 1),
        "bf16_render_lpips_vs_fp32": round(bf16_lpips, 4),
        "device": str(dev),
    }
    # Flush the headline NOW: every optional section below is
    # best-effort extra evidence, never allowed to starve the record.
    print(json.dumps(headline), flush=True)

    extras = {}

    def emit():
        """Print the full merged record after EVERY completed section, so
        a driver kill at any point still leaves the last complete line
        carrying all evidence gathered so far (round-3/4 lesson: sections
        that ran but never printed produced zero driver artifacts)."""
        print(json.dumps({**headline, **extras,
                          "bench_elapsed_s": round(budget.elapsed(), 1),
                          "section_elapsed_s": budget.section_s}),
              flush=True)

    # 4a) Self-bootstrap the gate's aux nets from the generator itself
    # (tgi/invert/bootstrap.py): pose ResNet + projection VGG trained on
    # a G-rendered pseudo-dataset (the reference's own protocol,
    # scripts/gen_pseudo_dataset.py + train_pose_estimator.py, extended
    # to the VGG with pose/latent/dense-recon heads), plus the latent
    # head as the e4e substitute. Without this the gate's random-init
    # feature nets are pose-uninformative and the camera random-walks
    # (measured 3 -> 80 deg, PERF.md round 5) — the gate would measure
    # the stand-in weights, not the machinery.
    state = {"q": None, "fast_sec": None, "aux": None}

    def sec_bootstrap():
        from tgi.invert.bootstrap import bootstrap_aux_nets
        p_t, v_t, e4e_t, rep = bootstrap_aux_nets(
            G, params, key=jax.random.PRNGKey(100), pose_params=pose,
            vgg_params=vgg)
        state["aux"] = (p_t, v_t, e4e_t)
        extras.update({
            "bootstrap_pose_val_rot_deg": round(rep["pose_val_rot_deg"],
                                                1),
            "bootstrap_s": round(rep["dataset_s"] + rep["pose_train_s"]
                                 + rep["vgg_train_s"], 1),
        })

    if os.environ.get("TGI_BENCH_BOOTSTRAP", "1") == "1" and \
            budget.allow("bootstrap", 60):
        budget.run("bootstrap", sec_bootstrap)
        emit()

    # 4b) Self-inversion quality gate: invert a G-generated target with
    # known (w*, cam*) through the REAL full-budget pipeline
    # (Projector.project 400 steps -> PTICoach.tune 400 steps; the 0.06
    # early stop is disabled here — it is calibrated for pretrained
    # AlexNet-LPIPS and fires spuriously with the random-init one,
    # see self_inversion_eval's docstring). MS-SSIM/MSE/pose error are
    # weight-free. The pose net starts 3 deg off the truth — the
    # operating point of the reference's PRETRAINED estimator (the
    # scratch bootstrap net's own single-target prediction, recorded as
    # selfinv_net_pose_err_deg, varies 2-25 deg run to run); the gate
    # then measures the camera stream's REFINEMENT. With bootstrapped
    # nets the quat camera lr runs at reference/30: 6e-7 is tuned for
    # the pretrained estimator's weight-space Jacobian and measurably
    # overshoots with the scratch substitute (400-step final pose err:
    # 65.4 deg at parity lr, 7.6 at /10, 3.6 at /30, with preheat
    # DESCENDING 3 -> 2.5 deg — scripts/probe_gate_lr.py, PERF.md
    # round 5). Production parity is untouched; this is a gate-harness
    # adjustment for its substitute nets, disclosed as
    # selfinv_cam_lr_quat.
    GATE_CAM_LR = ProjectorConfig().cam_lr_quat / 30
    def sec_selfinv():
        from tgi.invert import self_inversion_eval
        aux = state["aux"]
        ovr = {"cam_lr_quat": GATE_CAM_LR} if aux else None
        # dispatch_chunk=50: the 350-step joint-phase scan in ONE
        # dispatch (~57 s) kills the axon TPU worker; 50-step dispatches
        # (~8 s) are proven safe. Numerically identical.
        q = self_inversion_eval(
            G, params, key=jax.random.PRNGKey(42),
            vgg_params=aux[1] if aux else vgg,
            lpips_head=head,
            pose_params=aux[0] if aux else pose, lpips_loss=lp,
            first_inv_steps=STAGE1_STEPS, max_pti_steps=STAGE2_STEPS,
            aim_pose_deg=3.0, aim_calibrate=not aux,
            e4e_encode=aux[2] if aux else None, proj_overrides=ovr,
            dispatch_chunk=50, early_stop_probe=0.06)
        extras["selfinv_bootstrapped"] = bool(aux)
        if aux:
            extras["selfinv_cam_lr_quat"] = GATE_CAM_LR
            extras["selfinv_net_pose_err_deg"] = round(
                q["net_pose_err_deg"], 2)
        state["q"] = q
        extras.update({
            "selfinv_final_lpips": round(q["final_lpips"], 4),
            "selfinv_final_ms_ssim": round(q["final_ms_ssim"], 4),
            "selfinv_final_mse": round(q["final_mse"], 5),
            "selfinv_pivot_ms_ssim": round(q["pivot_ms_ssim"], 4),
            "selfinv_init_pose_err_deg": round(
                q.get("init_pose_err_deg", float("nan")), 2),
            "selfinv_pose_err_deg": round(q["pose_err_deg"], 2),
            "selfinv_pti_steps": q["pti_steps"],
        })
        # Matched-protocol wall-clock: the reference's real per-image
        # time includes the LPIPS<=0.06 stage-2 early stop
        # (single_id_coach.py:69, hyperparameters.py:19-20 — BASELINE.md
        # assumes 200-400 effective steps). That threshold is calibrated
        # for PRETRAINED AlexNet-LPIPS (none mounted here), so the
        # quality-gated stop point is measured directly instead:
        # qconv_steps = first 50-step boundary of the SAME full-budget
        # tuning run whose MS-SSIM is within 0.01 of the full-budget
        # final (selfinv quality_trace). value_early_stop charges those
        # steps; early_stop_gate_ok asserts the stop is REAL (fires
        # before the budget) — if quality only converges at 400 the
        # matched number honestly equals the fixed-budget one. The
        # literal 0.06 machinery demo stays recorded as es006_*.
        if "qconv_steps" in q:
            es_sec = (STAGE1_STEPS * stage1_ms
                      + q["qconv_steps"] * stage2_ms) / 1e3
            extras.update({
                "selfinv_qconv_steps": q["qconv_steps"],
                "selfinv_qconv_ms_ssim": round(q["qconv_ms_ssim"], 4),
                "value_early_stop": round(es_sec, 2),
                "vs_baseline_early_stop": round(
                    REFERENCE_SEC_PER_IMAGE / es_sec, 2),
                "early_stop_gate_ok": bool(
                    q["qconv_steps"] < STAGE2_STEPS),
            })
        if "es_steps" in q:
            extras.update({
                "selfinv_es006_steps": q["es_steps"],
                "selfinv_es006_ms_ssim": round(q["es_ms_ssim"], 4),
            })

    # est 60: effectively always attempted — the quality block is the
    # highest-priority evidence after the headline (worst-case-cold it
    # overruns to ~20 min, acceptable; the headline already flushed).
    if os.environ.get("TGI_BENCH_SELFINV", "1") == "1" and \
            budget.allow("selfinv", 60):
        budget.run("selfinv", sec_selfinv)
        emit()

    # 5) Fast modes (quality-gated in section 6, never the headline):
    #   (a) canon256 — truncate the CANONICAL render's SR pyramid at 256
    #       (canon_sr_max_res: its only consumer is a <=256-res VGG
    #       feature map, warping_loss.py:7-10; the reference renders the
    #       full 512² and area-downsamples). Stage-1 only.
    #   (b) depth 32+32 instead of the reference's 48+48 — the sampling
    #       machinery (gather fwd + splat bwd) scales linearly with the
    #       point count. Both stages.
    #   fast_* = the COMBINED mode (a)+(b), the production fast config.
    FAST_RK = dict(depth_resolution=32, depth_resolution_importance=32)
    CANON_OVR = {"canon_sr_max_res": 256}

    def sec_fast():
        s1_canon, _ = measure_stage_steps(G, **shared,
                                          proj_overrides=CANON_OVR)
        extras["canon256_stage1_step_ms"] = round(s1_canon, 2)
        Gfast = TriPlaneGenerator(G.cfg.with_rendering(**FAST_RK))
        s1_fast, s2_fast = measure_stage_steps(Gfast, **shared,
                                               proj_overrides=CANON_OVR)
        fast_sec = (STAGE1_STEPS * s1_fast + STAGE2_STEPS * s2_fast) / 1e3
        state["fast_sec"] = fast_sec
        extras.update({
            "fast_stage1_step_ms": round(s1_fast, 2),
            "fast_stage2_step_ms": round(s2_fast, 2),
            "fast_sec_per_image": round(fast_sec, 2),
            # NON-PARITY ratio: full-fidelity reference wall-clock over a
            # reduced-fidelity (32+32 samples + canon256) pipeline. The
            # parity headline is `vs_baseline` above.
            "fast_vs_baseline_nonparity": round(
                REFERENCE_SEC_PER_IMAGE / fast_sec, 2),
        })

    if os.environ.get("TGI_BENCH_FAST", "1") == "1" and \
            budget.allow("fast", 360):
        budget.run("fast", sec_fast)
        emit()

    # 6) Fast-mode quality gate (enforced comparison, not just printed):
    # weight-free metrics at the shared seed — MS-SSIM within 0.01 and
    # pose error within 0.5 deg of the parity-settings gate.
    def sec_fast_selfinv():
        from tgi.invert import self_inversion_eval
        q = state["q"]
        Gfast = TriPlaneGenerator(G.cfg.with_rendering(**FAST_RK))
        # target_G=G: the target is rendered at the PARITY sampling
        # settings (48+48, full SR) and inverted by the FAST pipeline —
        # the real-world question (fast machinery vs full-fidelity
        # image), not a softer fast-vs-fast round trip.
        aux = state["aux"]
        ovr = dict(CANON_OVR, **({"cam_lr_quat": GATE_CAM_LR}
                                 if aux else {}))
        qf = self_inversion_eval(
            Gfast, params, key=jax.random.PRNGKey(42),
            vgg_params=aux[1] if aux else vgg,
            lpips_head=head,
            pose_params=aux[0] if aux else pose, lpips_loss=lp,
            first_inv_steps=STAGE1_STEPS, max_pti_steps=STAGE2_STEPS,
            aim_pose_deg=3.0, aim_calibrate=not aux,
            e4e_encode=aux[2] if aux else None,
            target_G=G, dispatch_chunk=50, proj_overrides=ovr)
        extras.update({
            "fast_selfinv_final_lpips": round(qf["final_lpips"], 4),
            "fast_selfinv_final_ms_ssim": round(qf["final_ms_ssim"], 4),
            "fast_selfinv_final_mse": round(qf["final_mse"], 5),
            "fast_selfinv_pose_err_deg": round(qf["pose_err_deg"], 2),
            "fast_selfinv_pti_steps": qf["pti_steps"],
            "fast_gate_ms_ssim_delta": round(
                q["final_ms_ssim"] - qf["final_ms_ssim"], 4),
            "fast_gate_ok": bool(
                qf["final_ms_ssim"] >= q["final_ms_ssim"] - 0.01
                and qf["pose_err_deg"] <= q["pose_err_deg"] + 0.5),
        })

    if state["fast_sec"] is not None and state["q"] is not None and \
            os.environ.get("TGI_BENCH_SELFINV", "1") == "1" and \
            budget.allow("fast_selfinv", 900):
        budget.run("fast_selfinv", sec_fast_selfinv)
        emit()

    # 7) Batched inversion (PERF.md "paths past the ceiling"): B images
    # through project_batch semantics — per-image optimization states
    # vmapped (reference is strictly per-image, w_projector.py:62,
    # 120-131), shared frozen generator so convs batch on the MXU.
    # batched_sec_per_image pairs the batched stage-1 with the
    # (per-image) stage-2 from the headline — a valid schedule: batch
    # stage 1 across images, then tune each generator copy sequentially.
    # Measured verdict (PERF.md "Batched inversion, measured"): stage 1
    # does NOT amortize on one chip — per-image noise buffers live in the
    # generator weights, so the convs can't share weights across the
    # batch; kept as evidence, lowest priority.
    def sec_batched(B):
        s1b = measure_batched_stage1(G, params=params, vgg=vgg,
                                     head=head, pose=pose, B=B)
        extras[f"batched_stage1_step_ms_per_image_b{B}"] = round(s1b, 2)
        extras[f"batched_sec_per_image_b{B}"] = round(
            (STAGE1_STEPS * s1b + STAGE2_STEPS * stage2_ms) / 1e3, 2)
        if os.environ.get("TGI_BENCH_BATCHED_S2", "1") != "1" or \
                not budget.allow(f"batched_s2_b{B}", 420):
            return
        s2b = measure_batched_stage2(G, params=params, ws=ws, c=c,
                                     lp=lp, B=B)
        extras[f"batched_stage2_step_ms_per_image_b{B}"] = round(s2b, 2)
        # Fully-batched schedule: both stages amortized across B.
        extras[f"batched_sec_per_image_full_b{B}"] = round(
            (STAGE1_STEPS * s1b + STAGE2_STEPS * s2b) / 1e3, 2)

    if os.environ.get("TGI_BENCH_BATCHED", "1") == "1":
        for B in (2, 4):
            if not budget.allow(f"batched_b{B}", 420):
                break
            ok = budget.run(f"batched_b{B}", lambda B=B: sec_batched(B))
            emit()
            if not ok:
                break

    # 8) Batched self-inversion quality: the same closed-loop gate at
    # B=4 — image 0 reuses section 4's exact (z, cam*) so its metrics
    # are directly comparable to selfinv_* (per-image optimization
    # semantics must hold at B>1).
    def sec_batched_quality():
        from tgi.invert import self_inversion_eval_batch
        # chunk=10 at B=4: ~4x the per-step cost of the single-image
        # path, so a 10-step dispatch stays in the proven-safe window
        # (divides the 50-step preheat phase -> still 2 scan programs).
        aux = state["aux"]
        # Same gate config as 4b (aimed 3 deg, bootstrapped nets + gate
        # cam lr when available). The batched path has no e4e hook —
        # start_w stays mean-w, so its pose numbers are comparable only
        # within this section.
        qb = self_inversion_eval_batch(
            G, params, key=jax.random.PRNGKey(42), batch_size=4,
            vgg_params=aux[1] if aux else vgg, lpips_head=head,
            pose_params=aux[0] if aux else pose,
            aim_pose_deg=3.0, aim_calibrate=not aux,
            proj_overrides={"cam_lr_quat": GATE_CAM_LR} if aux else None,
            lpips_loss=lp, first_inv_steps=STAGE1_STEPS,
            max_pti_steps=STAGE2_STEPS, dispatch_chunk=10)
        extras.update({
            "batched_selfinv_img0_final_ms_ssim":
                round(qb["per_image"][0]["final_ms_ssim"], 4),
            "batched_selfinv_img0_pose_err_deg":
                round(qb["per_image"][0]["pose_err_deg"], 2),
            "batched_selfinv_img0_init_pose_err_deg": round(
                qb["per_image"][0].get("init_pose_err_deg",
                                       float("nan")), 2),
            "batched_selfinv_mean_final_ms_ssim":
                round(qb["mean_final_ms_ssim"], 4),
            "batched_selfinv_max_pose_err_deg":
                round(qb["max_pose_err_deg"], 2),
        })
        if state["q"] is not None:
            extras["batched_gate_ok"] = bool(
                qb["per_image"][0]["final_ms_ssim"]
                >= state["q"]["final_ms_ssim"] - 0.01)

    if os.environ.get("TGI_BENCH_BATCHED_QUALITY", "1") == "1" and \
            budget.allow("batched_quality", 600):
        budget.run("batched_quality", sec_batched_quality)
        emit()

    # 9) (last) The reference README stages ffhqrebalanced512-128.pkl — same
    # architecture and weight shapes, but neural_rendering_resolution=128
    # as a pickled attribute (4x the rays; the raw 64² render is
    # otherwise bilinearly lifted to the SR's 128 input,
    # superresolution.py:48-51). Measure the same steps at that ray count
    # so the bench covers the shipped checkpoint's exact workload
    # (BASELINE.md "Ray-count note").
    def sec_128rays():
        import dataclasses
        G128 = TriPlaneGenerator(dataclasses.replace(
            G.cfg, neural_rendering_resolution=128))
        s1_128, s2_128 = measure_stage_steps(G128, **shared)
        extras.update({
            "stage1_step_ms_128rays": round(s1_128, 2),
            "stage2_step_ms_128rays": round(s2_128, 2),
            "sec_per_image_128rays": round(
                (STAGE1_STEPS * s1_128 + STAGE2_STEPS * s2_128) / 1e3, 2),
        })

    if os.environ.get("TGI_BENCH_128", "1") == "1" and \
            budget.allow("128rays", 360):
        budget.run("128rays", sec_128rays)

    final = {**headline, **extras,
             "bench_elapsed_s": round(budget.elapsed(), 1),
             "section_elapsed_s": budget.section_s}
    if budget.skipped:
        final["skipped_sections"] = budget.skipped
    if budget.failed:
        final["failed_sections"] = budget.failed
    print(json.dumps(final), flush=True)


if __name__ == "__main__":
    main()
