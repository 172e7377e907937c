"""App-layer tests: pose pipeline, alignment math, inception detector,
locality regularizer, checkpoints."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_generator import tiny_config, camera_batch
from tgi.models import TriPlaneGenerator


@pytest.fixture(scope="module")
def tiny():
    G = TriPlaneGenerator(tiny_config())
    return G, G.init(jax.random.PRNGKey(0))


def test_pose_pipeline_smoke(tiny, tmp_path):
    from tgi.apps.pose_pipeline import (gen_pseudo_dataset,
                                        load_pseudo_dataset, pose_loss,
                                        train_pose_estimator)
    from tgi.models.pose_resnet import resnet34_init
    G, params = tiny
    n = gen_pseudo_dataset(G, params, str(tmp_path), num_images=6, batch=3)
    assert n == 6
    assert os.path.exists(tmp_path / "pseudo_cam_gt.txt")
    imgs, exts = load_pseudo_dataset(str(tmp_path), size=64)
    assert imgs.shape == (6, 3, 64, 64) and exts.shape == (6, 4, 4)
    # Extrinsics are valid camera poses (orthonormal R, radius 2.7).
    for e in exts:
        np.testing.assert_allclose(e[:3, :3] @ e[:3, :3].T, np.eye(3),
                                   atol=1e-4)
        np.testing.assert_allclose(np.linalg.norm(e[:3, 3]), 2.7, rtol=1e-4)

    pose = resnet34_init(jax.random.PRNGKey(1), output_dims=4)
    loss0, _ = pose_loss(pose, jnp.asarray(imgs), jnp.asarray(exts), "quat")
    best, history = train_pose_estimator(
        pose, (imgs, exts), mode="quat", lr=1e-3, batch=3, steps=4,
        val_every=2)
    assert len(history) >= 1
    assert np.isfinite(history[-1]["val"])


def test_alignment_quad_math():
    from tgi.utils.alignment import align_face, compute_alignment_quad
    from PIL import Image
    # Synthetic frontal landmarks on a 512² canvas.
    lm = np.zeros((68, 2), np.float64)
    lm[36:42] = [200, 220]      # left eye
    lm[42:48] = [312, 220]      # right eye
    lm[48:60] = [256, 330]      # mouth ring
    lm[48] = [210, 330]         # mouth left
    lm[54] = [302, 330]         # mouth right
    quad, qsize = compute_alignment_quad(lm)
    assert quad.shape == (4, 2) and qsize > 0
    # Quad center sits between eyes and mouth.
    center = quad.mean(0)
    assert 200 < center[0] < 312 and 220 < center[1] < 340

    img = Image.fromarray((np.random.RandomState(0).rand(512, 512, 3)
                           * 255).astype(np.uint8))
    out = align_face(img, lm, output_size=64, transform_size=256)
    assert out.size == (64, 64)


def test_inception_shapes_and_converter():
    from tgi.metrics.inception import (convert_torch_inception,
                                       inception_v3_init,
                                       inception_v3_features)
    p = inception_v3_init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 299, 299)) * 0.1
    f = inception_v3_features(p, x)
    assert f.shape == (2, 2048)
    assert np.isfinite(np.asarray(f)).all()
    # Converter: structural round-trip of a fake torchvision state_dict.
    sd = {"Conv2d_1a_3x3.conv.weight": np.ones((32, 3, 3, 3), np.float32),
          "Conv2d_1a_3x3.bn.weight": np.ones(32, np.float32),
          "Conv2d_1a_3x3.bn.num_batches_tracked": np.asarray(1),
          "fc.weight": np.ones((1000, 2048), np.float32)}
    c = convert_torch_inception(sd)
    assert "fc" in c      # kept for the Inception Score
    assert "num_batches_tracked" not in c["Conv2d_1a_3x3"]["bn"]
    assert c["Conv2d_1a_3x3"]["conv"]["weight"].shape == (32, 3, 3, 3)


def _synthetic_nvidia_inception_sd(fused=False):
    """A state_dict in the NVIDIA detector's TF-graph naming with the
    real architecture's shapes (derived by inverting the converter's
    slot tables against the skeleton init)."""
    from tgi.metrics.inception import (_NV_BLOCKS, _NV_BRANCH_BY_BLOCK,
                                       _NV_STEM, inception_v3_init)
    rng = np.random.RandomState(0)
    skel = inception_v3_init(jax.random.PRNGKey(0))
    inv_stem = {v: k for k, v in _NV_STEM.items()}
    inv_blocks = {v: k for k, v in _NV_BLOCKS.items()}
    sd = {}

    def emit(prefix, shape):
        out_c = shape[0]
        sd[f"{prefix}.weight"] = rng.randn(*shape).astype(np.float32) * 0.02
        if fused:
            sd[f"{prefix}.bias"] = rng.randn(out_c).astype(np.float32) * 0.1
        else:
            sd[f"{prefix}.beta"] = rng.randn(out_c).astype(np.float32) * 0.1
            sd[f"{prefix}.mean"] = rng.randn(out_c).astype(np.float32) * 0.1
            sd[f"{prefix}.var"] = (rng.rand(out_c).astype(np.float32) * 0.5
                                   + 0.5)

    for block, sub in skel.items():
        if "conv" in sub:
            emit(f"layers.{inv_stem[block]}", sub["conv"]["weight"].shape)
        else:
            inv_branch = {v: k
                          for k, v in _NV_BRANCH_BY_BLOCK[block].items()}
            for name, node in sub.items():
                emit(f"layers.{inv_blocks[block]}.{inv_branch[name]}",
                     node["conv"]["weight"].shape)
    sd["output.weight"] = rng.randn(1008, 2048).astype(np.float32) * 0.01
    sd["output.bias"] = rng.randn(1008).astype(np.float32) * 0.01
    return sd


def test_nvidia_inception_converter():
    """metric_utils.py:44-57 detector: the TF-named NVIDIA pickle layout
    converts onto the torchvision-style slots; BN-separate and BN-folded
    variants agree numerically; junk layouts fail loudly."""
    from tgi.metrics.inception import (convert_nvidia_inception,
                                       nvidia_detector_fn)
    sd = _synthetic_nvidia_inception_sd(fused=False)
    params = convert_nvidia_inception(sd)
    imgs = (np.random.RandomState(1).rand(2, 3, 128, 128) * 255
            ).astype(np.float32)
    feats = nvidia_detector_fn(params)(jnp.asarray(imgs))
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()
    logits = nvidia_detector_fn(params, return_logits=True)(
        jnp.asarray(imgs))
    assert logits.shape == (2, 1008)
    nb = nvidia_detector_fn(params, return_logits=True,
                            no_output_bias=True)(jnp.asarray(imgs))
    np.testing.assert_allclose(
        np.asarray(logits) - np.asarray(nb),
        np.tile(np.asarray(params["fc"]["bias"]), (2, 1)), atol=1e-5)

    # BN-folded twin: fold each node's stats into (weight, bias) with
    # the apply path's eps and require identical features.
    eps = 1e-3
    fused = {}
    for k, v in sd.items():
        if k.endswith(".weight") and v.ndim == 4:
            prefix = k[:-len(".weight")]
            var = sd[f"{prefix}.var"]
            scale = 1.0 / np.sqrt(var + eps)
            fused[k] = v * scale[:, None, None, None]
            fused[f"{prefix}.bias"] = (sd[f"{prefix}.beta"]
                                       - sd[f"{prefix}.mean"] * scale)
        elif k.startswith("output."):
            fused[k] = v
    params_fused = convert_nvidia_inception(fused)
    feats_fused = nvidia_detector_fn(params_fused)(jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(feats_fused), np.asarray(feats),
                               rtol=1e-3, atol=1e-5)

    # Fail-loud: unknown node name / missing block.
    import pytest as _pytest
    bad = dict(sd)
    bad["layers.mixed_11.conv.weight"] = np.zeros((8, 8, 1, 1), np.float32)
    with _pytest.raises(ValueError, match="unrecognized"):
        convert_nvidia_inception(bad)
    partial = {k: v for k, v in sd.items() if "mixed_9" not in k}
    with _pytest.raises(ValueError, match="missing"):
        convert_nvidia_inception(partial)


def test_locality_regularizer(tiny):
    from tgi.losses.locality import LocalityConfig, SpaceRegularizer
    from tgi.losses.lpips import LPIPSLoss
    G, params = tiny
    lp = LPIPSLoss(key=jax.random.PRNGKey(2))
    reg = SpaceRegularizer(G, params, lp, camera_batch(1),
                           LocalityConfig(num_samples=1))
    w = jnp.zeros((1, G.cfg.num_ws, 32))
    # Identical params -> zero loss; perturbed params -> positive.
    zero = reg(params, w, jax.random.PRNGKey(3))
    assert abs(float(zero)) < 1e-6
    import jax as _jax
    perturbed = _jax.tree_util.tree_map(lambda v: v + 0.05, params)
    assert float(reg(perturbed, w, jax.random.PRNGKey(3))) > 0


def test_checkpoint_roundtrip(tiny, tmp_path):
    from tgi.io import load_checkpoint, save_checkpoint
    G, params = tiny
    path = str(tmp_path / "g.ckpt")
    save_checkpoint(path, params, config=G.cfg, metadata={"kimg": 12})
    data = load_checkpoint(path)
    assert data["metadata"]["kimg"] == 12
    assert data["config"]["img_resolution"] == G.cfg.img_resolution
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(data["params"])
    assert len(a) == len(b)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_coach_with_locality_wired(tiny):
    """PTICoach + SpaceRegularizer end-to-end (BASELINE config 4 wiring):
    the regularizer receives the per-image camera from the coach and the
    tuned params differ from a run without it."""
    from tgi.invert import CoachConfig, PTICoach
    from tgi.losses.locality import LocalityConfig, SpaceRegularizer
    from tgi.losses.lpips import AlexLPIPSLoss
    G, params = tiny
    lp = AlexLPIPSLoss(key=jax.random.PRNGKey(2))
    reg = SpaceRegularizer(G, params, lp, camera=None,
                           cfg=LocalityConfig(num_samples=1))
    coach = PTICoach(G, lp, CoachConfig(max_pti_steps=2,
                                        lpips_threshold=0.0),
                     locality_regularizer=reg)
    cam = camera_batch(1)
    w = jnp.zeros((1, G.cfg.num_ws, 32))
    real = jnp.zeros((1, 3, G.cfg.img_resolution, G.cfg.img_resolution))
    tuned, info = coach.tune(jax.random.PRNGKey(3), params, w, cam, real)
    assert int(info["steps"]) == 2
    diff = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))),
        jax.tree_util.tree_map(lambda a, b: a - b, tuned, params), 0.0)
    assert diff > 0


def test_run_pti_cli_fails_loudly(tmp_path):
    """Missing weight files must abort, not random-init (VERDICT round 1)."""
    from click.testing import CliRunner
    from tgi.apps.run_pti import main
    from tgi.io import save_checkpoint
    from tests.test_generator import tiny_config
    G = TriPlaneGenerator(tiny_config())
    ck = str(tmp_path / "g.ckpt")
    save_checkpoint(ck, G.init(jax.random.PRNGKey(0)), config=G.cfg)
    (tmp_path / "imgs").mkdir()
    r = CliRunner().invoke(main, ["--network", ck,
                                  "--images", str(tmp_path / "imgs"),
                                  "--outdir", str(tmp_path / "out")])
    assert r.exit_code != 0
    assert "--pose-weights" in r.output and "--allow-random-init" in r.output
    # A typo'd path is an error even with --allow-random-init.
    r2 = CliRunner().invoke(main, ["--network", ck,
                                   "--images", str(tmp_path / "imgs"),
                                   "--outdir", str(tmp_path / "out"),
                                   "--allow-random-init",
                                   "--pose-weights", "/no/such/file.pt"])
    assert r2.exit_code != 0 and "file not found" in r2.output


def test_visualizer_controls(tiny):
    """Widget parity of the browser visualizer core (viz/*.py): style
    mixing, conditioning pose, FOV, noise mode, depth mult, plane-layer
    capture — served end-to-end over HTTP."""
    import io as _io
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from PIL import Image
    from tgi.apps.visualizer import VisualizerState, make_handler

    G, params = tiny
    state = VisualizerState(G, params)

    base = state.render(seed=0, mult=1)
    assert base.shape[0] == 3
    mixed = state.render(seed=0, mixseed=3, mixlayer=1, mult=1)
    assert np.abs(base - mixed).max() > 1e-4      # mixing changes output
    fov = state.render(seed=0, fov=30.0, mult=1)
    assert np.abs(base - fov).max() > 1e-4        # fov changes framing
    cond = state.render(seed=0, cyaw=0.5, mult=1)
    assert cond.shape == base.shape
    pl = state.render(seed=0, rtype="planes", layerch=5, mult=1)
    assert pl.shape[0] == 3 and pl.min() >= -1 and pl.max() <= 1
    d = state.render(seed=0, rtype="image_depth", mult=1)
    assert d.shape[0] == 3

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    port = server.server_address[1]
    try:
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/").read().decode()
        assert "stylemix" in html and "cond yaw" in html
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?seed=1&mult=1"
            "&mixseed=2&mixlayer=1&rtype=image").read()
        img = Image.open(_io.BytesIO(png))
        assert img.size == (G.cfg.img_resolution, G.cfg.img_resolution)
        # Performance readout (viz/performance_widget): server-side
        # rolling render timings.
        import json as _json
        stats = _json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats").read())
        assert stats["frames"] >= 7 and stats["avg_ms"] > 0
        # Capture widget (viz/capture_widget): save-png endpoint.
        cap = _json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/capture?seed=1&mult=1").read())
        import os as _os
        assert _os.path.exists(cap["path"])
        Image.open(cap["path"])
        _os.remove(cap["path"])
    finally:
        server.shutdown()


def test_align_data_cli(tmp_path):
    """align_data CLI end-to-end with a landmark sidecar
    (utils/align_data.py parity, detector supplied offline)."""
    import json as _json

    from click.testing import CliRunner
    from PIL import Image
    from tgi.apps.align_data import main

    src = tmp_path / "raw"
    src.mkdir()
    arr = (np.random.RandomState(0).rand(512, 512, 3) * 255).astype(np.uint8)
    Image.fromarray(arr).save(src / "a.png")
    lm = np.zeros((68, 2), np.float64)
    lm[36:42] = [200, 220]
    lm[42:48] = [312, 220]
    lm[48:60] = [256, 330]
    lm[48] = [210, 330]
    lm[54] = [302, 330]
    (tmp_path / "lm.json").write_text(_json.dumps({"a.png": lm.tolist()}))
    r = CliRunner().invoke(main, ["--src", str(src),
                                  "--dst", str(tmp_path / "out"),
                                  "--landmarks", str(tmp_path / "lm.json"),
                                  "--size", "128"])
    assert r.exit_code == 0, r.output
    out = Image.open(tmp_path / "out" / "a.png")
    assert out.size == (128, 128)


def test_render_orbit_shape_export(tiny, tmp_path):
    """Per-frame shape export in the video path (gen_videos.py:139-177)."""
    from tgi.apps.gen_videos import render_orbit
    G, params = tiny
    w = jnp.zeros((1, G.cfg.num_ws, 32))
    frames = render_orbit(G, params, w, num_frames=2, batch=2,
                          sample_mult=1, shapes_dir=str(tmp_path / "sh"),
                          shape_res=24)
    assert frames.shape[0] == 2
    plys = sorted(os.listdir(tmp_path / "sh"))
    assert plys == ["0000_shape.ply", "0001_shape.ply"]
    head = (tmp_path / "sh" / "0000_shape.ply").read_bytes()[:200]
    assert head.startswith(b"ply")


def test_ganspace_component_loader(tmp_path):
    """Shipped-basis loader (ganspace/pca_comp/*.npy, run_ganspace.py:66):
    accepts [K, w_dim] unit-norm rows, rejects transposed/denormalized
    layouts loudly."""
    from tgi.apps.ganspace import load_components
    rng = np.random.RandomState(0)
    q, _ = np.linalg.qr(rng.randn(512, 512))
    comps = q.T.astype(np.float32)          # rows orthonormal
    p = tmp_path / "pca.npy"
    np.save(p, comps)
    loaded = load_components(str(p))
    np.testing.assert_allclose(loaded, comps, atol=0)
    # Truncated basis is still valid (K < w_dim rows)...
    np.save(p, comps[:10])
    assert load_components(str(p)).shape == (10, 512)
    # ...but wrong w_dim and non-unit rows fail loudly.
    np.save(p, comps[:, :100])
    with pytest.raises(ValueError, match="expected"):
        load_components(str(p))
    np.save(p, comps * 3.0)
    with pytest.raises(ValueError, match="unit-norm"):
        load_components(str(p))
    # The real reference artifacts pass validation when present.
    ref = "/root/reference/ganspace/pca_comp/pca_ffhqrebalanced_10_5_frontcam.npy"
    if os.path.exists(ref):
        assert load_components(ref).shape == (512, 512)


def test_ganspace_edit_matches_reference_math():
    """edit_ws/edit_sweep vs a literal NumPy transcription of
    run_ganspace.py:28-40: V = comps.T, one-hot control * power,
    direction matrix over [start_layer, start_layer+layer_num)."""
    from tgi.apps.ganspace import DIRECTIONS, edit_ws
    rng = np.random.RandomState(1)
    comps = np.linalg.qr(rng.randn(512, 512))[0].T.astype(np.float32)
    w = rng.randn(1, 14, 512).astype(np.float32)

    for name, spec in DIRECTIONS.items():
        idx, (lo, hi), power = spec["comp"], spec["layers"], spec["strength"]
        # Reference math.
        V = comps.T                                   # [512, K]
        control = np.zeros(512, np.float32)
        control[idx] = power
        direction = (V @ control).reshape(1, 1, 512)  # [1, 1, 512]
        dmat = np.zeros((1, 14, 512), np.float32)
        dmat[0, lo:hi, :] = direction
        assert lo + (hi - lo) <= 14, name             # run_ganspace.py:24
        # tgi path.
        ours = np.asarray(edit_ws(w, comps, idx, power, (lo, hi)))
        np.testing.assert_allclose(ours, w + dmat, atol=1e-6)


def test_ganspace_sweep(tiny, tmp_path):
    """edit_sweep's control schedule: num_imgs powers linearly spanning
    [-edit_power, +edit_power] (run_ganspace.py:32), direction matrices
    returned per image."""
    from tgi.apps.ganspace import edit_sweep
    from tests.test_generator import camera_batch
    G, params = tiny
    comps = np.linalg.qr(
        np.random.RandomState(2).randn(32, 32))[0].T.astype(np.float32)
    w = jnp.zeros((1, G.cfg.num_ws, 32))
    imgs, dirs = edit_sweep(G, params, w, camera_batch(1), comps,
                            comp_idx=3, layers=(0, 5), edit_power=2.0,
                            num_imgs=3, outdir=str(tmp_path))
    assert imgs.shape[0] == 3 and dirs.shape == (3, G.cfg.num_ws, 32)
    # Powers -2, 0, +2: middle image is the unedited render.
    np.testing.assert_allclose(dirs[1], 0.0, atol=1e-6)
    np.testing.assert_allclose(dirs[0], -dirs[2], atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(dirs[2][:5], axis=-1), 2.0, atol=1e-4)
    assert np.asarray(jnp.abs(imgs[0] - imgs[2])).mean() > 0
    assert os.path.exists(tmp_path / "sweep_grid.png")


def test_run_pti_batched_app(tiny, tmp_path):
    """run_pti(batch=2) end-to-end app plumbing: chunked pivot reload,
    PTICoach.tune_batch stage 2, per-lane artifact emission (grids,
    tuned ckpts, metrics, results.json). Stage 1's batched path is
    covered by the slow project_batch test + the multichip dryrun; here
    pre-saved pivots exercise the use_last_w_pivots branch (whole-chunk
    reuse, base_coach.py:69-77 semantics at B > 1)."""
    from tests.test_generator import camera_batch
    from tgi.apps.run_pti import run_pti
    from tgi.models.pose_resnet import resnet34_init
    from tgi.models.vgg import lpips_head_init, vgg16_init
    from tgi.utils.image import save_image

    G, params = tiny
    key = jax.random.PRNGKey(0)
    kv, kh, kp = jax.random.split(key, 3)
    img_dir = tmp_path / "imgs"
    out_dir = tmp_path / "out"
    os.makedirs(img_dir)
    os.makedirs(out_dir)

    c = camera_batch(1)
    for i, name in enumerate(["a", "b"]):
        ws = jnp.full((1, G.cfg.num_ws, 32), 0.05 * i)
        img = G.synthesis(params, ws, c, det=True)["image"]
        save_image(str(img_dir / f"{name}.png"), np.asarray(img)[0])
        np.save(out_dir / f"{name}_ws.npy", np.asarray(ws))
        np.save(out_dir / f"{name}_cam.npy", np.asarray(c))

    results = run_pti(
        str(img_dir), str(out_dir), G=G, gen_params=params,
        pose_params=resnet34_init(kp, output_dims=4),
        vgg_params=vgg16_init(kv), lpips_head=lpips_head_init(kh),
        lpips_type="vgg", max_pti_steps=2, gen_video=False,
        gen_mesh=False, do_evaluation=True, use_last_w_pivots=True,
        batch=2)

    assert len(results) == 2
    assert [r["image"] for r in results] == ["a", "b"]
    for r in results:
        assert 0 <= r["pti_steps"] <= 2
        assert np.isfinite(r["final_lpips"])
        assert np.isfinite(r["ms_ssim"])
    for name in ("a", "b"):
        assert os.path.exists(out_dir / f"{name}.png")
        assert os.path.exists(out_dir / f"{name}_pivot.png")
        assert os.path.exists(out_dir / f"{name}_G.ckpt")
        assert os.path.exists(out_dir / f"{name}metrics.txt")
    assert os.path.exists(out_dir / "results.json")
