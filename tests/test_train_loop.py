"""Integration smoke of the GAN training loop: synthetic dataset, two
ticks, snapshots + stats.jsonl + image grids on disk."""

import json
import os
import zipfile

import numpy as np
import pytest

import jax

from tests.test_generator import tiny_config
from tgi.models import TriPlaneGenerator
from tgi.nn.discriminator import DiscriminatorConfig
from tgi.train.gan import GANTrainConfig
from tgi.train.loop import training_loop


def _make_dataset(path, n=8, res=64):
    import io
    from PIL import Image
    rng = np.random.RandomState(0)
    labels = []
    cam = np.eye(4, dtype=np.float32)
    cam[2, 3] = 2.7
    intr = np.asarray([4.2647, 0, 0.5, 0, 4.2647, 0.5, 0, 0, 1], np.float32)
    label = np.concatenate([cam.reshape(-1), intr]).tolist()
    with zipfile.ZipFile(path, "w") as z:
        for i in range(n):
            arr = (rng.rand(res, res, 3) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            z.writestr(f"img{i}.png", buf.getvalue())
            labels.append([f"img{i}.png", label])
        z.writestr("dataset.json", json.dumps({"labels": labels}))


def test_training_loop_abort_and_outputs(tmp_path):
    data = str(tmp_path / "data.zip")
    _make_dataset(data)
    run_dir = str(tmp_path / "run")
    G = TriPlaneGenerator(tiny_config())
    d_cfg = DiscriminatorConfig(c_dim=25, img_resolution=64, img_channels=6,
                                channel_base=512, channel_max=32,
                                mbstd_group_size=2, mapping_layers=2)
    cfg = GANTrainConfig(batch_size=2, blur_init_sigma=0,
                         density_reg_samples=16, g_reg_interval=2,
                         d_reg_interval=2)
    ticks = []
    state = training_loop(
        G=G, d_cfg=d_cfg, data_path=data, run_dir=run_dir, cfg=cfg,
        total_kimg=100, kimg_per_tick=0.004, snapshot_ticks=1,
        image_snapshot_ticks=1, ada_target=None,
        abort_fn=lambda: ticks.append(1) or len(ticks) >= 2)
    files = os.listdir(run_dir)
    assert any(f.startswith("network-") for f in files)
    assert any(f.startswith("fakes-") for f in files)
    with open(os.path.join(run_dir, "stats.jsonl")) as f:
        records = [json.loads(l) for l in f if l.strip()]
    tick_records = [r for r in records if "g_loss" in r]
    assert len(tick_records) >= 2
    assert all(np.isfinite(r["g_loss"]) for r in tick_records)
    # Resume from the snapshot.
    snap = sorted(f for f in files if f.startswith("network-"))[-1]
    from tgi.io import load_checkpoint
    data2 = load_checkpoint(os.path.join(run_dir, snap))
    assert data2["metadata"]["cur_nimg"] > 0


def test_training_loop_orbax_snapshots_and_resume(tmp_path):
    """checkpoint_backend='orbax': versioned step snapshots with
    retention (max_to_keep) under run_dir/snapshots, restore_latest
    round-trip, and loop resume continuing from the saved cur_nimg."""
    data = str(tmp_path / "data.zip")
    _make_dataset(data)
    run_dir = str(tmp_path / "run")
    G = TriPlaneGenerator(tiny_config())
    d_cfg = DiscriminatorConfig(c_dim=25, img_resolution=64, img_channels=6,
                                channel_base=512, channel_max=32,
                                mbstd_group_size=2, mapping_layers=2)
    cfg = GANTrainConfig(batch_size=2, blur_init_sigma=0,
                         density_reg_samples=16, g_reg_interval=2,
                         d_reg_interval=2)
    ticks = []
    state = training_loop(
        G=G, d_cfg=d_cfg, data_path=data, run_dir=run_dir, cfg=cfg,
        total_kimg=100, kimg_per_tick=0.004, snapshot_ticks=1,
        image_snapshot_ticks=0, ada_target=None,
        checkpoint_backend="orbax", snapshot_keep=2,
        abort_fn=lambda: ticks.append(1) or len(ticks) >= 3)

    from tgi.io.orbax_io import make_manager, restore_latest
    snap_dir = os.path.join(run_dir, "snapshots")
    mgr = make_manager(snap_dir, max_to_keep=2)
    steps = mgr.all_steps()
    assert len(steps) >= 1
    assert len(steps) <= 2, steps          # retention enforced
    template = {"params": jax.device_get(state),
                "cur_nimg": np.asarray(0)}
    restored, step = restore_latest(mgr, template)
    assert step == max(steps)
    assert int(restored["cur_nimg"]) == step
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["g_ema"]["decoder"]["net0"]["weight"]),
        np.asarray(state["g_ema"]["decoder"]["net0"]["weight"]))

    # Resume: the loop restores the newest step and continues from it.
    ticks2 = []
    training_loop(
        G=G, d_cfg=d_cfg, data_path=data, run_dir=run_dir, cfg=cfg,
        total_kimg=100, kimg_per_tick=0.004, snapshot_ticks=1,
        image_snapshot_ticks=0, ada_target=None,
        checkpoint_backend="orbax", snapshot_keep=2, resume_ckpt=snap_dir,
        abort_fn=lambda: ticks2.append(1) or len(ticks2) >= 1)
    mgr2 = make_manager(snap_dir, max_to_keep=2)
    assert max(mgr2.all_steps()) > step
