"""Optimization-process observability for the inversion pipeline.

Parity targets:
  * w_projector.py:193-212 — ``visualize_opt_process`` (a PNG of the
    current reconstruction every 10 steps under ``<outdir>_pivot/<name>/``)
    and ``visualize_warp_process`` (the canonical view warped to the
    predicted camera).
  * utils/log_utils.py:9-21 — wandb scalar/image logging, provided here as
    an optional tensorboard writer behind the jsonl source of truth.

TPU note: the projector's hot loop is a fused lax.scan; snapshots hook in
at CHUNK boundaries (Projector.project(snapshot_fn=..., snapshot_every=N))
so the loop stays on device — each snapshot is one extra deterministic
render on the current state, not a per-step host sync.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


class TBWriter:
    """Optional tensorboard mirror for scalar/image streams.

    jsonl stays the source of truth (tgi.utils.stats.Collector); this
    writer is additive and degrades to a no-op when the tensorboard
    package is unavailable.
    """

    def __init__(self, logdir):
        self._w = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._w = SummaryWriter(logdir)
        except Exception:          # pragma: no cover - env without TB
            pass

    @property
    def active(self):
        return self._w is not None

    def scalar(self, tag, value, step):
        if self._w is not None:
            self._w.add_scalar(tag, float(value), int(step))

    def scalars(self, values: dict, step, prefix=""):
        for k, v in values.items():
            try:
                self.scalar(prefix + k, float(np.asarray(v)), step)
            except (TypeError, ValueError):
                pass               # non-scalar entries (e.g. cameras)

    def image(self, tag, img_chw, step, input_range=(-1, 1)):
        """img_chw: [3, H, W] in input_range."""
        if self._w is None:
            return
        lo, hi = input_range
        arr = (np.asarray(img_chw, np.float32) - lo) / (hi - lo)
        self._w.add_image(tag, np.clip(arr, 0, 1), int(step))

    def flush(self):
        if self._w is not None:
            self._w.flush()

    def close(self):
        if self._w is not None:
            self._w.close()


class WandbWriter:
    """wandb mirror of the reference's ``use_wandb`` hooks
    (base_coach.py:107-115, utils/log_utils.py:9-21), duck-type
    compatible with :class:`TBWriter` — pass it anywhere a ``tb`` writer
    is accepted. Defaults WANDB_MODE=offline (zero-egress environments;
    runs sync later with ``wandb sync``) and degrades to a no-op when
    the wandb package is unavailable."""

    def __init__(self, project="tgi", run_name=None, config=None):
        self._run = None
        self._wandb = None
        try:                        # pragma: no cover - env without wandb
            os.environ.setdefault("WANDB_MODE", "offline")
            import wandb
            self._run = wandb.init(project=project, name=run_name,
                                   config=dict(config or {}))
            self._wandb = wandb
        except Exception:
            pass

    @property
    def active(self):
        return self._run is not None

    def scalar(self, tag, value, step):
        if self._run is not None:
            self._wandb.log({tag: float(value)}, step=int(step))

    def scalars(self, values: dict, step, prefix=""):
        if self._run is None:
            return
        out = {}
        for k, v in values.items():
            try:
                out[prefix + k] = float(np.asarray(v))
            except (TypeError, ValueError):
                pass
        if out:
            self._wandb.log(out, step=int(step))

    def image(self, tag, img_chw, step, input_range=(-1, 1)):
        """img_chw: [3, H, W] in input_range (log_image_from_w parity)."""
        if self._run is None:
            return
        lo, hi = input_range
        arr = (np.asarray(img_chw, np.float32) - lo) / (hi - lo)
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8).transpose(1, 2, 0)
        self._wandb.log({tag: self._wandb.Image(arr)}, step=int(step))

    def flush(self):
        pass

    def close(self):
        if self._run is not None:
            self._run.finish()


class FanoutWriter:
    """Broadcast to several TBWriter-interface writers (e.g. TB + wandb
    together, matching reference runs that log to both)."""

    def __init__(self, writers):
        self.writers = [w for w in writers if w is not None]

    @property
    def active(self):
        return any(w.active for w in self.writers)

    def scalar(self, tag, value, step):
        for w in self.writers:
            w.scalar(tag, value, step)

    def scalars(self, values, step, prefix=""):
        for w in self.writers:
            w.scalars(values, step, prefix=prefix)

    def image(self, tag, img_chw, step, input_range=(-1, 1)):
        for w in self.writers:
            w.image(tag, img_chw, step, input_range=input_range)

    def flush(self):
        for w in self.writers:
            w.flush()

    def close(self):
        for w in self.writers:
            w.close()


def make_projection_snapshotter(proj, out_dir, name, *, save_warp=True,
                                tb: TBWriter | None = None):
    """Build a ``snapshot_fn(step, train_state)`` for Projector.project.

    Renders the current (w, camera) state deterministically, saves
    ``<out_dir>_pivot/<name>/<step>.png`` (w_projector.py:196-199) and —
    when ``save_warp`` — the canonical view warped into the predicted
    camera as ``warp_<step>.png`` (w_projector.py:207-212's
    visualize_warp_process, relocated under the run's output directory).
    """
    from functools import partial

    from tgi.invert.projector import assemble_camera, merge_noise
    from tgi.losses.warp import calc_warping_loss
    from tgi.models.pose_resnet import resnet34_apply
    from tgi.models.vgg import warping_features
    from tgi.utils.image import save_image

    pivot_dir = f"{out_dir}_pivot/{name}"
    os.makedirs(pivot_dir, exist_ok=True)
    G, cfg = proj.G, proj.cfg

    @jax.jit
    def render(train_state, target_255):
        pose_out = resnet34_apply(train_state["pose"], target_255)
        pred_ext, pred_cam = assemble_camera(
            pose_out, train_state["translation"], cfg.camera_mode,
            cfg.radius, proj.intrinsic.reshape(9))
        ws = jnp.tile(train_state["w"], (1, G.cfg.num_ws, 1))
        params = merge_noise(proj.base_params, train_state["noise"])
        pred = G.synthesis(params, ws, pred_cam, noise_mode="const",
                           det=True, force_fp32=True)
        warped = None
        if save_warp:
            canon = G.synthesis(params, ws, proj.canonical_cam,
                                noise_mode="const", det=True,
                                force_fp32=True)
            _, warped = calc_warping_loss(
                canon["image"], partial(warping_features, proj.vgg_params),
                pred_ext, proj.init_ext, proj.intrinsic[None],
                pred["image_depth"], target_255 / 127.5 - 1.0)
        return pred["image"], warped

    def snapshot(step, train_state, target_255):
        img, warped = render(train_state, target_255)
        save_image(os.path.join(pivot_dir, f"{int(step)}.png"),
                   np.asarray(img[0]))
        if tb is not None:
            tb.image(f"{name}/reconstruction", np.asarray(img[0]), step)
        if warped is not None:
            save_image(os.path.join(pivot_dir, f"warp_{int(step)}.png"),
                       np.asarray(warped[0]))
            if tb is not None:
                tb.image(f"{name}/warp", np.asarray(warped[0]), step)

    return snapshot
