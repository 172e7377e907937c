"""EG3D GAN training loop harness.

Behavioral parity target: training/training_loop.py:95-464 — infinite
rank-sharded data, lazy-regularization phase cadence, EMA, ADA
adjustment, tick logging (stdout + stats.jsonl), image/checkpoint
snapshots, in-loop metric hooks, cooperative abort.

TPU-first differences: one jitted train_step already contains G+D+EMA
(tgi.train.gan); the host loop only feeds batches, flips the lazy-reg
booleans, adjusts ADA p, and does IO. Multi-chip: batches sharded over
the mesh 'data' axis; params replicated (no broadcast step needed — the
initial device_put replicates, training_loop.py:193-200's NCCL broadcast
has no equivalent cost).
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from tgi.train.dataset import ImageFolderDataset, infinite_batches
from tgi.train.gan import GANTrainer, GANTrainConfig, init_train_state
from tgi.utils.stats import Collector, JsonlLogger


def training_loop(
    *,
    G,                       # TriPlaneGenerator (config object)
    d_cfg,                   # DiscriminatorConfig
    data_path: str,
    run_dir: str,
    cfg: GANTrainConfig = GANTrainConfig(),
    total_kimg: int = 25000,
    kimg_per_tick: int = 4,
    snapshot_ticks: int = 50,
    image_snapshot_ticks: int = 50,
    ada_target: float | None = 0.6,
    mesh=None,
    resume_ckpt: str | None = None,
    seed: int = 0,
    metric_fns: dict | None = None,
    abort_fn=None,
    tensorboard: bool = False,
    checkpoint_backend: str = "msgpack",   # 'msgpack' | 'orbax'
    snapshot_keep: int = 5,
):
    """GAN training loop (reference training_loop.py:93-430).

    ``checkpoint_backend='orbax'`` switches the periodic snapshots to an
    orbax CheckpointManager under ``run_dir/snapshots`` — versioned step
    directories with ``snapshot_keep`` retention (the reference keeps
    every pickle, training_loop.py:396-410; retention is what production
    runs actually need). ``resume_ckpt`` then names that directory and
    the NEWEST step is restored.
    """
    os.makedirs(run_dir, exist_ok=True)
    logger = JsonlLogger(os.path.join(run_dir, "stats.jsonl"))
    collector = Collector()
    tb = None
    if tensorboard:
        # Optional mirror of the jsonl stream (utils/log_utils.py parity).
        from tgi.utils.opt_viz import TBWriter
        tb = TBWriter(os.path.join(run_dir, "tb"))

    dataset = ImageFolderDataset(data_path,
                                 resolution=G.cfg.img_resolution,
                                 xflip=True)
    host_id = jax.process_index()
    num_hosts = jax.process_count()
    batches = infinite_batches(dataset, cfg.batch_size, seed=seed,
                               host_id=host_id, num_hosts=num_hosts)

    from tgi.train.augment import AdaptiveAugment, AugmentPipe
    augment_fn = AugmentPipe() if ada_target is not None else None
    trainer = GANTrainer(G, d_cfg, cfg, augment_fn=augment_fn)
    key = jax.random.PRNGKey(seed)
    state = init_train_state(key, G, d_cfg, trainer)
    cur_nimg = 0
    manager = None
    if checkpoint_backend == "orbax":
        from tgi.io.orbax_io import make_manager
        manager = make_manager(os.path.join(run_dir, "snapshots"),
                               max_to_keep=snapshot_keep)
    if resume_ckpt:
        if checkpoint_backend == "orbax":
            from tgi.io.orbax_io import make_manager, restore_latest
            src = (manager if os.path.abspath(resume_ckpt)
                   == os.path.abspath(os.path.join(run_dir, "snapshots"))
                   else make_manager(resume_ckpt,
                                     max_to_keep=snapshot_keep))
            template = {"params": jax.device_get(state),
                        "cur_nimg": np.asarray(0)}
            data, _step = restore_latest(src, template)
            if data is not None:
                state = data["params"]
                cur_nimg = int(data["cur_nimg"])
        else:
            from tgi.io import load_checkpoint
            data = load_checkpoint(resume_ckpt, template=state)
            state = data["params"]
            cur_nimg = int((data["metadata"] or {}).get("cur_nimg", 0))

    if mesh is not None:
        from tgi.parallel import replicate
        state = replicate(mesh, state)

    ada_p = 0.0
    ada = (AdaptiveAugment(target=ada_target, batch_size=cfg.batch_size)
           if ada_target is not None else None)
    ada_signs = []          # Loss/signs/real window since last adjustment
    batch_idx = 0

    tick = 0
    tick_start_nimg = cur_nimg
    tick_start_time = time.time()
    start_time = tick_start_time

    while cur_nimg < total_kimg * 1000:
        real_img, real_c = next(batches)
        key, k_step, k_z = jax.random.split(key, 3)
        z = jax.random.normal(k_z, (cfg.batch_size, G.cfg.z_dim))
        batch_tree = (z, jnp.asarray(real_c), jnp.asarray(real_img))
        if mesh is not None:
            from tgi.parallel import shard_batch
            batch_tree = shard_batch(mesh, batch_tree)
        z, real_c, real_img = batch_tree

        n_batch = cur_nimg // cfg.batch_size
        do_greg = (n_batch % cfg.g_reg_interval) == 0
        do_dreg = (n_batch % cfg.d_reg_interval) == 0
        state, metrics = trainer.train_step(
            state, z, real_c, real_img, k_step, cur_nimg=cur_nimg,
            do_greg=do_greg, do_dreg=do_dreg, ada_p=ada_p)
        cur_nimg += cfg.batch_size
        batch_idx += 1
        host_metrics = {k: float(v) for k, v in metrics.items()}
        collector.update(host_metrics)

        # ADA heuristic every ada_interval batches from Loss/signs/real
        # (training_loop.py:325-328).
        if ada is not None:
            ada_signs.append(host_metrics["signs_real"])
            if batch_idx % ada.interval == 0:
                ada_p = ada.update(float(np.mean(ada_signs)))
                ada_signs.clear()

        if cur_nimg >= tick_start_nimg + kimg_per_tick * 1000:
            now = time.time()
            stats = collector.as_dict()
            record = {
                "tick": tick, "kimg": cur_nimg / 1000,
                "sec_per_kimg": (now - tick_start_time)
                / max((cur_nimg - tick_start_nimg) / 1000, 1e-8),
                "total_sec": now - start_time, "ada_p": ada_p,
                **{k: v["mean"] for k, v in stats.items()},
            }
            print(" ".join(f"{k} {v:.4g}" if isinstance(v, float)
                           else f"{k} {v}" for k, v in record.items()))
            logger.write(record)
            if tb is not None:
                tb.scalars(record, cur_nimg // 1000, prefix="train/")
                tb.flush()
            collector.reset()

            if snapshot_ticks and tick % snapshot_ticks == 0:
                if manager is not None:
                    from tgi.io.orbax_io import save_step
                    save_step(manager, cur_nimg,
                              {"params": jax.device_get(state),
                               "cur_nimg": np.asarray(cur_nimg)})
                else:
                    from tgi.io import save_checkpoint
                    save_checkpoint(
                        os.path.join(run_dir,
                                     f"network-{cur_nimg // 1000:06d}.ckpt"),
                        jax.device_get(state),
                        metadata={"cur_nimg": cur_nimg})
                if metric_fns:
                    for name, fn in metric_fns.items():
                        val = fn(state["g_ema"])
                        logger.write({"metric": name, "value": float(val),
                                      "kimg": cur_nimg / 1000})

            if image_snapshot_ticks and tick % image_snapshot_ticks == 0:
                _save_snapshot_grid(G, state["g_ema"], run_dir, cur_nimg,
                                    key)

            tick += 1
            tick_start_nimg = cur_nimg
            tick_start_time = now
            if abort_fn is not None and abort_fn():
                break
    if manager is not None:
        manager.wait_until_finished()   # orbax saves are async
    logger.close()
    return state


def _save_snapshot_grid(G, g_ema, run_dir, cur_nimg, key, n=4):
    from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                    pack_camera)
    from tgi.utils.image import save_image_grid
    cam = look_at_pose(np.pi / 2, np.pi / 2, jnp.asarray([0., 0., 0.2]),
                       radius=2.7)
    c = pack_camera(jnp.tile(cam[None], (n, 1, 1)), fov_to_intrinsics(18.837))
    z = jax.random.normal(key, (n, G.cfg.z_dim))
    img = G(g_ema, z, c, truncation_psi=0.7, det=True)["image"]
    save_image_grid(os.path.join(run_dir,
                                 f"fakes-{cur_nimg // 1000:06d}.png"),
                    np.asarray(img), cols=n)
