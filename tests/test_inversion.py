"""End-to-end smoke tests for the two-stage inversion engine (tiny config).

Mirrors SURVEY.md section 4d: a few-step projection on a fixed target with
fixed PRNG must run on-device, produce well-formed outputs, and reduce the
reconstruction loss.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_generator import tiny_config, camera_batch
from tgi.invert import Projector, ProjectorConfig, PTICoach, CoachConfig
from tgi.invert.projector import collect_noise_paths, extract_noise, \
    merge_noise
from tgi.losses.lpips import LPIPSLoss
from tgi.models import TriPlaneGenerator
from tgi.models.pose_resnet import resnet34_init
from tgi.models.vgg import lpips_head_init, vgg16_init


@pytest.fixture(scope="module")
def setup():
    G = TriPlaneGenerator(tiny_config())
    key = jax.random.PRNGKey(0)
    kg, kv, kh, kp, kt = jax.random.split(key, 5)
    gen_params = G.init(kg)
    vgg_params = vgg16_init(kv)
    lpips_head = lpips_head_init(kh)
    pose_params = resnet34_init(kp, output_dims=4)
    # Target: a render from the same generator at a known camera (so the
    # optimum exists), converted to [0,255] 256².
    c = camera_batch(1)
    z = jax.random.normal(kt, (1, 32))
    out = G(params=gen_params, z=z, c=c, det=True)
    img = out["image"] * 127.5 + 128
    target = jax.image.resize(img, (1, 3, 256, 256), method="linear")
    return dict(G=G, gen=gen_params, vgg=vgg_params, head=lpips_head,
                pose=pose_params, target=jnp.clip(target, 0, 255))


def test_noise_path_utils(setup):
    paths = collect_noise_paths(setup["gen"])
    assert len(paths) > 0
    assert all(p[-1] == "noise_const" for p in paths)
    noise = extract_noise(setup["gen"], paths)
    merged = merge_noise(setup["gen"], {k: v + 1 for k, v in noise.items()})
    n2 = extract_noise(merged, paths)
    for k in noise:
        np.testing.assert_allclose(np.asarray(n2[k]),
                                   np.asarray(noise[k]) + 1)
    # Non-noise leaves untouched.
    np.testing.assert_array_equal(
        np.asarray(merged["mapping"]["fc0"]["weight"]),
        np.asarray(setup["gen"]["mapping"]["fc0"]["weight"]))


def test_projection_smoke(setup):
    cfg = ProjectorConfig(num_steps=6, cam_preheat_steps=3, w_avg_samples=32,
                          camera_mode="quat")
    proj = Projector(setup["G"], setup["gen"], setup["vgg"], setup["head"],
                     setup["pose"], cfg)
    ws, cam, state, metrics = proj.project(jax.random.PRNGKey(1),
                                           setup["target"])
    assert ws.shape == (1, setup["G"].cfg.num_ws, 32)
    assert cam.shape == (1, 25)
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    assert metrics["loss"].shape == (6,)
    # Camera stays on the radius-2.7 sphere.
    ext = np.asarray(cam)[0, :16].reshape(4, 4)
    np.testing.assert_allclose(np.linalg.norm(ext[:3, 3]), 2.7, rtol=1e-4)
    # Rotation orthonormal.
    R = ext[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    # Noise buffers stay normalized.
    for v in state["noise"].values():
        np.testing.assert_allclose(float(jnp.mean(v)), 0.0, atol=1e-5)
        np.testing.assert_allclose(float(jnp.mean(v ** 2)), 1.0, rtol=1e-4)


def test_projection_loss_decreases(setup):
    """With enough joint steps the LPIPS distance must drop."""
    cfg = ProjectorConfig(num_steps=16, cam_preheat_steps=2,
                          w_avg_samples=32, camera_mode="quat")
    proj = Projector(setup["G"], setup["gen"], setup["vgg"], setup["head"],
                     setup["pose"], cfg)
    _, _, _, metrics = proj.project(jax.random.PRNGKey(2), setup["target"])
    dist = np.asarray(metrics["dist"])
    assert dist[-1] < dist[2] * 1.001, dist  # joint phase reduces distance


def test_self_inversion_quality_gate(setup):
    """Scaled-down closed-loop inversion (60+60 steps, tiny G): the real
    Projector -> PTICoach path on a G-generated target with known
    (w*, cam*). Full-budget numbers come from bench.py on the chip;
    this validates the harness and directions of improvement."""
    from tgi.invert import self_inversion_eval
    from tgi.losses.lpips import LPIPSLoss

    lp = LPIPSLoss(setup["vgg"], setup["head"])
    out = self_inversion_eval(
        setup["G"], setup["gen"], key=jax.random.PRNGKey(11),
        vgg_params=setup["vgg"], lpips_head=setup["head"],
        pose_params=setup["pose"], lpips_loss=lp,
        first_inv_steps=60, max_pti_steps=60, w_avg_samples=32,
        early_stop_probe=0.06)
    for k, v in out.items():
        assert np.isfinite(v), (k, v)
    # Stage-1 made progress on its own loss.
    assert out["stage1_final_loss"] < out["stage1_first_loss"]
    # Stage-2 tuning must not make the reconstruction worse.
    assert out["final_mse"] <= out["pivot_mse"] * 1.05
    assert out["pti_steps"] <= 60
    # The matched-protocol probe ran stage 2 with the production 0.06
    # stop and reported steps-at-stop + quality-at-stop.
    assert 0 <= out["es_steps"] <= 60
    assert out["es_threshold"] == 0.06


def test_self_inversion_fast_mode_target_g(setup):
    """bench.py's quality-gated fast mode: a reduced-sampling pipeline
    (with_rendering depth 32+32-scaled) inverting a target rendered at
    the PARITY sampling settings via ``target_G``. Validates the
    cross-config plumbing the on-chip gate relies on; tiny budget —
    the full-budget numbers come from bench.py."""
    from tgi.invert import self_inversion_eval
    from tgi.losses.lpips import LPIPSLoss

    G = setup["G"]
    rk = G.cfg.rendering_kwargs
    G_fast = TriPlaneGenerator(G.cfg.with_rendering(
        depth_resolution=max(4, rk["depth_resolution"] * 2 // 3),
        depth_resolution_importance=max(
            4, rk["depth_resolution_importance"] * 2 // 3)))
    lp = LPIPSLoss(setup["vgg"], setup["head"])
    out = self_inversion_eval(
        G_fast, setup["gen"], key=jax.random.PRNGKey(11),
        vgg_params=setup["vgg"], lpips_head=setup["head"],
        pose_params=setup["pose"], lpips_loss=lp,
        first_inv_steps=6, max_pti_steps=6, w_avg_samples=32,
        target_G=G)
    for k, v in out.items():
        assert np.isfinite(v), (k, v)
    assert out["pti_steps"] <= 6


def test_pti_early_stop_engages(setup):
    """The on-device 0.06 early stop (single_id_coach.py:69-73): tuning
    toward a target the generator already reproduces exactly must stop
    at step 0 (LPIPS checked BEFORE the first update)."""
    from tests.test_generator import camera_batch
    from tgi.losses.lpips import LPIPSLoss

    G, gen = setup["G"], setup["gen"]
    lp = LPIPSLoss(setup["vgg"], setup["head"])
    coach = PTICoach(G, lp, CoachConfig(max_pti_steps=50))
    ws = jnp.zeros((1, G.cfg.num_ws, G.cfg.w_dim))
    cam = camera_batch(1)
    target = G.synthesis(gen, ws, cam, det=True)["image"]
    tuned, info = coach.tune(jax.random.PRNGKey(3), gen, ws, cam, target)
    assert int(info["steps"]) == 0, info
    assert float(info["final_lpips"]) <= 0.06
    # Params untouched.
    np.testing.assert_array_equal(
        np.asarray(tuned["decoder"]["net0"]["weight"]),
        np.asarray(gen["decoder"]["net0"]["weight"]))


def test_batched_projection_zero_preheat_traces(setup):
    """project_batch with a zero-step phase (cam_preheat_steps=0) must
    trace: the chunk loop used to collect no metric trees for the empty
    phase and tree_map() over zero trees raised TypeError. eval_shape
    exercises the full trace without the (slow on CPU) compile."""
    cfg = ProjectorConfig(num_steps=2, cam_preheat_steps=0, w_avg_samples=8,
                          camera_mode="quat")
    proj = Projector(setup["G"], setup["gen"], setup["vgg"], setup["head"],
                     setup["pose"], cfg)
    targets = jnp.concatenate([setup["target"],
                               jnp.flip(setup["target"], -1)])  # B=2
    ws, cams, _states, metrics = jax.eval_shape(
        lambda k, t: proj.project_batch(k, t), jax.random.PRNGKey(7),
        targets)
    assert ws.shape == (2, 1, setup["G"].cfg.num_ws, 32)
    assert cams.shape == (2, 1, 25)
    # Metrics cover all num_steps even though the preheat phase is empty.
    assert metrics["loss"].shape[0] == 2


@pytest.mark.slow
def test_batched_projection(setup):
    """vmapped multi-image inversion: per-image state, shared generator.

    Marked slow: CPU XLA takes ~45 min to compile the vmapped scan (the
    TPU/remote compiler handles it in seconds — this is a host-compiler
    pathology, not a graph problem). Run with ``-m slow``.
    """
    cfg = ProjectorConfig(num_steps=4, cam_preheat_steps=2, w_avg_samples=16,
                          camera_mode="quat")
    proj = Projector(setup["G"], setup["gen"], setup["vgg"], setup["head"],
                     setup["pose"], cfg)
    targets = jnp.concatenate([setup["target"],
                               jnp.flip(setup["target"], -1)])  # B=2
    ws, cams, states, metrics = proj.project_batch(jax.random.PRNGKey(7),
                                                   targets)
    assert ws.shape == (2, 1, setup["G"].cfg.num_ws, 32)
    assert cams.shape == (2, 1, 25)
    for b in range(2):
        ext = np.asarray(cams)[b, 0, :16].reshape(4, 4)
        np.testing.assert_allclose(np.linalg.norm(ext[:3, 3]), 2.7,
                                   rtol=1e-4)
    # Per-image latents diverged (different targets -> different grads).
    # Note the pose nets may still be bitwise-equal after few steps: with
    # Adam, early updates are sign-driven (±lr per weight), so per-image
    # magnitude differences don't show until signs diverge.
    w0 = np.asarray(states["w"])[0]
    w1 = np.asarray(states["w"])[1]
    assert not np.array_equal(w0, w1)


def test_pti_smoke(setup):
    G = setup["G"]
    lp = LPIPSLoss(setup["vgg"], setup["head"])
    coach = PTICoach(G, lp, CoachConfig(max_pti_steps=4))
    ws = jnp.zeros((1, G.cfg.num_ws, 32))
    c = camera_batch(1)
    real = G.synthesis(setup["gen"], ws, c, det=True)["image"]
    tuned, info = coach.tune(jax.random.PRNGKey(3), setup["gen"], ws, c,
                             real)
    assert int(info["steps"]) <= 4
    assert np.isfinite(float(info["final_lpips"]))
    # Params changed (unless early-stopped at step 0).
    if int(info["steps"]) > 0:
        before = np.asarray(setup["gen"]["decoder"]["net0"]["weight"])
        after = np.asarray(tuned["decoder"]["net0"]["weight"])
        assert not np.allclose(before, after)


def test_pti_early_stop_with_zero_threshold(setup):
    """Threshold=inf stops immediately without touching params."""
    G = setup["G"]
    lp = LPIPSLoss(setup["vgg"], setup["head"])
    coach = PTICoach(G, lp, CoachConfig(max_pti_steps=8,
                                        lpips_threshold=np.inf))
    ws = jnp.zeros((1, G.cfg.num_ws, 32))
    c = camera_batch(1)
    real = G.synthesis(setup["gen"], ws, c, det=True)["image"]
    tuned, info = coach.tune(jax.random.PRNGKey(4), setup["gen"], ws, c,
                             real)
    assert int(info["steps"]) == 0
    np.testing.assert_array_equal(
        np.asarray(tuned["decoder"]["net0"]["weight"]),
        np.asarray(setup["gen"]["decoder"]["net0"]["weight"]))


def test_projection_snapshots(setup, tmp_path):
    """visualize_opt_process parity (w_projector.py:193-212): chunked
    projection fires the snapshot callback at boundaries, writes pivot
    PNG + warp PNG per boundary, and metrics cover every step."""
    import os

    from tgi.utils.opt_viz import make_projection_snapshotter

    proj = Projector(setup["G"], setup["gen"], setup["vgg"], setup["head"],
                     setup["pose"],
                     ProjectorConfig(num_steps=6, cam_preheat_steps=2,
                                     w_avg_samples=8))
    out_dir = str(tmp_path / "run")
    snap = make_projection_snapshotter(proj, out_dir, "img0")
    seen = []

    def counting_snap(step, state, target):
        seen.append(int(step))
        snap(step, state, target)

    ws, cam, state, metrics = proj.project(
        jax.random.PRNGKey(1), setup["target"], snapshot_fn=counting_snap,
        snapshot_every=2)
    assert seen == [2, 4, 6]
    assert metrics["loss"].shape[0] == 6
    pivot_dir = f"{out_dir}_pivot/img0"
    files = sorted(os.listdir(pivot_dir))
    assert "2.png" in files and "6.png" in files
    assert "warp_2.png" in files
    assert ws.shape[1] == setup["G"].cfg.num_ws


def test_tune_batch_matches_sequential(setup):
    """tune_batch == B sequential tune calls up to batched-matmul
    reassociation (vmapped convs reduce in a different order, ~1e-7
    drift; per-image early-stop lanes freeze exactly —
    single_id_coach.py:40-77 semantics at B > 1)."""
    G = setup["G"]
    lp = LPIPSLoss(setup["vgg"], setup["head"])
    coach = PTICoach(G, lp, CoachConfig(max_pti_steps=3))
    c = camera_batch(1)
    ws0 = jnp.zeros((1, G.cfg.num_ws, 32))
    ws1 = jnp.full((1, G.cfg.num_ws, 32), 0.1)
    reals = jnp.stack([
        G.synthesis(setup["gen"], ws0, c, det=True)["image"],
        G.synthesis(setup["gen"], ws1, c, det=True)["image"]])
    pivots = jnp.stack([ws0, ws1])
    cams = jnp.stack([c, c])

    key = jax.random.PRNGKey(11)
    tuned_b, info_b = coach.tune_batch(key, setup["gen"], pivots, cams,
                                       reals)
    keys = jax.random.split(key, 2)
    for i in range(2):
        tuned_i, info_i = coach.tune(keys[i], setup["gen"], pivots[i],
                                     cams[i], reals[i])
        assert int(info_b["steps"][i]) == int(info_i["steps"])
        np.testing.assert_allclose(
            np.asarray(info_b["final_lpips"][i]),
            np.asarray(info_i["final_lpips"]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_map(
                lambda x: x[i], tuned_b)["decoder"]["net0"]["weight"]),
            np.asarray(tuned_i["decoder"]["net0"]["weight"]), atol=1e-5)


def test_tune_batch_remat_matches(setup):
    """CoachConfig(remat=True) changes memory, not math."""
    G = setup["G"]
    lp = LPIPSLoss(setup["vgg"], setup["head"])
    c = camera_batch(1)
    ws = jnp.zeros((1, G.cfg.num_ws, 32))
    real = G.synthesis(setup["gen"], ws, c, det=True)["image"]
    outs = []
    for remat in (False, True):
        coach = PTICoach(G, lp, CoachConfig(max_pti_steps=2, remat=remat))
        tuned, info = coach.tune(jax.random.PRNGKey(5), setup["gen"], ws,
                                 c, real)
        outs.append((np.asarray(tuned["decoder"]["net0"]["weight"]),
                     int(info["steps"])))
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-6)
    assert outs[0][1] == outs[1][1]


def test_dispatch_chunk_matches_unchunked(setup):
    """dispatch_chunk bounds per-dispatch execution time WITHOUT changing
    math: the chunked two-phase projection and the chunked PTI while_loop
    hand the exact carry across dispatches, so results are bit-identical
    to the single-dispatch path (the on-chip full-budget runs rely on
    this — the axon relay kills the worker on ~57 s single dispatches)."""
    cfg = ProjectorConfig(num_steps=6, cam_preheat_steps=3, w_avg_samples=32,
                          camera_mode="quat")
    runs = []
    for chunk in (None, 2):
        proj = Projector(setup["G"], setup["gen"], setup["vgg"],
                         setup["head"], setup["pose"],
                         ProjectorConfig(num_steps=6, cam_preheat_steps=3,
                                         w_avg_samples=32,
                                         camera_mode="quat",
                                         dispatch_chunk=chunk))
        ws, cam, _, metrics = proj.project(jax.random.PRNGKey(3),
                                           setup["target"])
        runs.append((np.asarray(ws), np.asarray(cam),
                     np.asarray(metrics["loss"])))
    np.testing.assert_array_equal(runs[0][0], runs[1][0])
    np.testing.assert_array_equal(runs[0][1], runs[1][1])
    np.testing.assert_array_equal(runs[0][2], runs[1][2])

    # Coach: chunked while_loop (limit in the carry) == one while_loop,
    # including the early-stop step count.
    G = setup["G"]
    lp = LPIPSLoss(setup["vgg"], setup["head"])
    c = camera_batch(1)
    ws0 = jnp.zeros((1, G.cfg.num_ws, 32))
    real = G.synthesis(setup["gen"], ws0, c, det=True)["image"]
    outs = []
    for chunk in (None, 2):
        coach = PTICoach(G, lp, CoachConfig(max_pti_steps=5,
                                            dispatch_chunk=chunk))
        tuned, info = coach.tune(jax.random.PRNGKey(7), setup["gen"], ws0,
                                 c, real)
        outs.append((np.asarray(tuned["decoder"]["net0"]["weight"]),
                     int(info["steps"]), float(info["final_lpips"])))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    assert outs[0][1] == outs[1][1]
    assert outs[0][2] == outs[1][2]


def test_aim_pose_net(setup):
    """aim_pose_net starts the pose net err_deg off the true rotation
    for the given target (exact bias shift through the saturated tanh),
    leaving predictions for OTHER inputs unconstrained but finite."""
    import math

    from tgi.invert import aim_pose_net, rotation_error_deg
    from tgi.invert.projector import assemble_camera, DEFAULT_INTRINSIC
    from tgi.models.pose_resnet import resnet34_apply
    from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                    pack_camera)

    cam_pose = look_at_pose(math.pi / 2 + 0.35, math.pi / 2 + 0.12,
                            jnp.asarray([0.0, 0.0, 0.2]), radius=2.7)
    cam_star = pack_camera(cam_pose[None], fov_to_intrinsics(18.837))
    intr = jnp.asarray(DEFAULT_INTRINSIC).reshape(9)
    aimed = aim_pose_net(setup["pose"], setup["target"],
                         cam_pose[:3, :3], err_deg=3.0,
                         camera_mode="quat", key=jax.random.PRNGKey(9))
    out0 = resnet34_apply(aimed, setup["target"])
    _, cam0 = assemble_camera(out0, jnp.zeros((1, 3)), "quat", 2.7, intr)
    err = float(rotation_error_deg(cam0, cam_star)[0])
    np.testing.assert_allclose(err, 3.0, atol=0.1)
    # Only the final bias moved.
    assert not np.array_equal(np.asarray(aimed["fc3"]["bias"]),
                              np.asarray(setup["pose"]["fc3"]["bias"]))
    np.testing.assert_array_equal(
        np.asarray(aimed["fc3"]["weight"]),
        np.asarray(setup["pose"]["fc3"]["weight"]))


def test_projection_canon_sr_max_res(setup):
    """canon_sr_max_res truncates the CANONICAL render's SR pyramid (its
    only consumer is the warp loss's <=256-res VGG features — a
    quality-gated fast mode, PERF.md); the projection must still run and
    reduce its loss, and the PREDICTED-view path stays full-resolution
    (the LPIPS branch would shape-error otherwise)."""
    res0 = setup["G"].cfg.sr_cfg.block0[2]
    cfg = ProjectorConfig(num_steps=6, cam_preheat_steps=2, w_avg_samples=16,
                          camera_mode="quat", canon_sr_max_res=res0)
    proj = Projector(setup["G"], setup["gen"], setup["vgg"], setup["head"],
                     setup["pose"], cfg)
    ws, cam, _state, metrics = proj.project(jax.random.PRNGKey(5),
                                            setup["target"])
    assert ws.shape == (1, setup["G"].cfg.num_ws, 32)
    loss = np.asarray(metrics["loss"])
    assert np.isfinite(loss).all()
    assert loss[-1] < loss[2] * 1.001
