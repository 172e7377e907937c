"""Stage-1 projection: joint w-latent + camera-pose optimization.

Behavioral parity target: training/projectors/w_projector.py:28-280. The
reference runs 400 eager PyTorch steps with 2 generator renders each and
per-step host round-trips; here the whole loop is TWO ``lax.scan`` calls
(camera-preheat phase, then joint phase) over ONE jitted step — the
800 generator fwd+bwd passes stay on device end to end, which is where
the >=5x wall-clock target over the RTX 3090 baseline comes from
(BASELINE.md).

Optimization state (reference w_projector.py:120-131):
  * w       — single 512-vector latent (tiled to num_ws at render time)
  * noise   — every SG2 noise_const buffer in backbone + SR, re-randomized
  * pose    — the whole ResNet-34 pose estimator's weights
  * translation — camera-frame translation, renormalized to radius 2.7
Three Adam optimizers with the reference's learning rates; the w/noise
optimizer's lr follows the ramped cosine schedule and w gets annealed
exploration noise (w_projector.py:174-188).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tgi.losses.basic import noise_regularization, normalize_noise
from tgi.losses.warp import area_downsample, calc_warping_loss
from tgi.models.pose_resnet import resnet34_apply
from tgi.models.vgg import lpips_features, warping_features
from tgi.render.cameras import (euler_to_rotmat, quaternion_to_rotmat,
                                rot6d_to_rotmat)

CANONICAL_EXTRINSIC = np.asarray(
    [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 2.7], [0, 0, 0, 1]], np.float32)
DEFAULT_INTRINSIC = np.asarray(
    [[4.2647, 0, 0.5], [0, 4.2647, 0.5], [0, 0, 1]], np.float32)


@dataclass(frozen=True)
class ProjectorConfig:
    num_steps: int = 400
    cam_preheat_steps: int = 50
    w_avg_samples: int = 5000
    first_inv_lr: float = 8e-3
    translation_lr: float = 2e-4
    cam_lr_2d: float = 6e-6
    cam_lr_quat: float = 6e-7
    cam_lr_6d: float = 6e-6
    camera_mode: str = "quat"        # '2d' | 'quat' | '6d'
    radius: float = 2.7
    initial_noise_factor: float = 0.05
    noise_ramp_length: float = 0.75
    lr_rampdown_length: float = 0.25
    lr_rampup_length: float = 0.05
    regularize_noise_weight: float = 1e5
    truncation_psi: float = 0.7
    truncation_cutoff: int = 14
    # The reference forces fp32 renders during projection
    # (w_projector.py:189, a CUDA fp16-stability guard). bf16 is the
    # native TPU precision; render_fp32=False lets the generator's
    # fused_dtype apply. Reconstruction quality is LPIPS-neutral (bench
    # check); default keeps bit-level reference behavior.
    render_fp32: bool = True
    # Rematerialize the render in the backward pass (jax.checkpoint):
    # trades ~one extra forward for dropping all render residuals —
    # needed for batched multi-image inversion where B x two-view
    # residuals exceed single-chip HBM.
    remat_render: bool = False
    # Render predicted+canonical views as one N=2 batch (True) or two
    # sequential N=1 renders (False). Measured on v5e: N=2 importance
    # rendering is super-linear (189 vs 2x76 ms fwd+bwd) and the
    # sequential step is ~60 ms faster (217 vs 274); kept switchable for
    # re-evaluation per hardware.
    batch_views: bool = False
    # Truncate the CANONICAL view's SR pyramid at this resolution (e.g.
    # 256 skips the 512² SR block). The canonical render's only consumer
    # is a <=256-res VGG feature map — the reference area-downsamples the
    # full 512² SR output to 256 before VGG (warping_loss.py:7-10); this
    # renders the 256-res SR skip directly instead. A quality-gated fast
    # mode (selfinv gate, PERF.md), NOT exact parity: None (default)
    # keeps reference behavior. Requires batch_views=False.
    canon_sr_max_res: int | None = None
    # Max optimization steps fused into ONE device dispatch. None = the
    # whole phase is one lax.scan (fastest; default). The axon TPU relay
    # kills the worker on very long single executions (the 350-step
    # joint-phase scan, ~57 s, crashes it; 50-step dispatches are fine —
    # bench probes 2026-08), so on-chip full-budget runs set a chunk.
    # Pick a divisor of cam_preheat_steps (10/25/50) so every segment
    # has the same length and only two scan programs compile. Numerics
    # are identical to the unchunked scan (same step body, carry handed
    # across dispatches).
    dispatch_chunk: int | None = None

    @property
    def cam_lr(self):
        return {"2d": self.cam_lr_2d, "quat": self.cam_lr_quat,
                "6d": self.cam_lr_6d}[self.camera_mode]


# ---------------------------------------------------------------------------
# Noise-buffer partitioning


def collect_noise_paths(params) -> list[tuple]:
    """Key-paths of every noise_const leaf in backbone + superresolution."""
    paths = []

    def walk(node, path):
        for k, v in node.items():
            if k == "noise_const":
                paths.append(path + (k,))
            elif isinstance(v, dict):
                walk(v, path + (k,))

    for top in ("backbone", "superresolution"):
        if top in params:
            walk(params[top], (top,))
    return sorted(paths)


def get_path(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def set_path(tree, path, value):
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: set_path(tree[path[0]], path[1:], value)}


def extract_noise(params, paths) -> dict:
    return {"/".join(p): get_path(params, p) for p in paths}


def merge_noise(params, noise: dict):
    for name, value in noise.items():
        params = set_path(params, tuple(name.split("/")), value)
    return params


# ---------------------------------------------------------------------------
# Camera assembly (w_projector.py:147-172)


def assemble_camera(pose_out, translation, mode: str, radius: float,
                    intrinsic_flat):
    """Pose-head output + optimizable translation -> (ext [N,4,4], cam [N,25])."""
    if mode == "quat":
        rotmat = quaternion_to_rotmat(pose_out)
    elif mode == "6d":
        rotmat = rot6d_to_rotmat(pose_out)
    else:
        theta = math.pi / 2 + pose_out[:, 0]
        phi = math.pi / 2 + pose_out[:, 1]
        rotmat = euler_to_rotmat(theta, phi)

    n = rotmat.shape[0]
    pred_translation = -radius * rotmat[:, :3, 2]
    trans_world = -jnp.einsum("nij,nj->ni", rotmat, translation) * radius
    t = trans_world + pred_translation
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True) * radius

    ext = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n, 1, 1))
    ext = ext.at[:, :3, :3].set(rotmat)
    ext = ext.at[:, :3, 3].set(t)
    cam = jnp.concatenate([ext.reshape(n, 16),
                           jnp.tile(intrinsic_flat[None], (n, 1))], axis=-1)
    return ext, cam


# ---------------------------------------------------------------------------
# Projector


class Projector:
    """Builds and runs the jitted two-phase projection for one target."""

    def __init__(self, G, gen_params, vgg_params, lpips_head, pose_params,
                 cfg: ProjectorConfig = ProjectorConfig(), e4e_encode=None):
        self.G = G
        self.cfg = cfg
        self.base_params = gen_params
        self.vgg_params = vgg_params
        self.lpips_head = lpips_head
        self.pose_params = pose_params
        self.e4e_encode = e4e_encode
        self.noise_paths = collect_noise_paths(gen_params)
        self.intrinsic = jnp.asarray(DEFAULT_INTRINSIC)
        self.init_ext = jnp.asarray(CANONICAL_EXTRINSIC)[None]
        self.canonical_cam = jnp.concatenate(
            [self.init_ext.reshape(1, 16), self.intrinsic.reshape(1, 9)],
            axis=-1)

    # -- initialization -----------------------------------------------------

    def compute_w_stats(self, key):
        """Mean/std of w under the canonical camera
        (w_projector.py:87-97)."""
        cfg = self.cfg
        z = jax.random.normal(key, (cfg.w_avg_samples, self.G.cfg.z_dim))
        cam = jnp.tile(self.canonical_cam, (cfg.w_avg_samples, 1))
        ws = self.G.mapping(self.base_params, z, cam,
                            truncation_psi=cfg.truncation_psi,
                            truncation_cutoff=cfg.truncation_cutoff)
        w = ws[:, 0, :]
        w_avg = w.mean(axis=0, keepdims=True)
        w_std = jnp.sqrt(jnp.sum(jnp.square(w - w_avg)) / cfg.w_avg_samples)
        return w_avg[None], w_std          # [1,1,D], scalar

    def init_state(self, key, target_255):
        """target_255: [1, 3, 256, 256] in [0, 255]."""
        cfg = self.cfg
        k_stats, k_noise = jax.random.split(key)
        w_avg, w_std = self.compute_w_stats(k_stats)
        start_w = w_avg
        if self.e4e_encode is not None:
            # w_opt starts at mean_w + the RAW encoder output
            # (w_projector.py:113-115: w_opt = mean_w + start_w, where
            # start_w = e4e_enc(target_e4e) and pSp2.forward returns
            # codes[:, 0, :] with NO latent_avg added, e4e/psp.py:47-64)
            # — the e4e output is a delta on the generator's truncated
            # w-mean, not an absolute latent. The encoder input is the
            # [0,255]-scaled 256-res target (w_projector.py:73).
            start_w = w_avg + self.e4e_encode(target_255)[:, None, :]

        # Re-randomize noise buffers (w_projector.py:126-131).
        noise = {}
        for i, p in enumerate(self.noise_paths):
            sub = jax.random.fold_in(k_noise, i)
            noise["/".join(p)] = jax.random.normal(
                sub, get_path(self.base_params, p).shape)

        train_state = {
            "w": start_w,
            "noise": noise,
            "translation": jnp.zeros((1, 3)),
            "pose": self.pose_params,
        }
        opts = self._optimizers()
        opt_states = {
            "w": opts["w"].init({"w": train_state["w"],
                                 "noise": train_state["noise"]}),
            "cam": opts["cam"].init(train_state["pose"]),
            "trans": opts["trans"].init(train_state["translation"]),
        }
        return train_state, opt_states, w_std

    def _optimizers(self):
        cfg = self.cfg
        return {
            "w": optax.inject_hyperparams(optax.adam)(
                learning_rate=cfg.first_inv_lr, b1=0.9, b2=0.999),
            "cam": optax.adam(cfg.cam_lr, b1=0.9, b2=0.999),
            "trans": optax.adam(cfg.translation_lr, b1=0.9, b2=0.999),
        }

    # -- loss ---------------------------------------------------------------

    def _loss(self, train_state, target_255, target_lpips_feats, w_noise,
              key, target_warp=None):
        cfg = self.cfg
        if target_warp is None:
            # Fallback for callers without the full-res target: the same
            # 256-res target in [-1, 1].
            target_warp = target_255 / 127.5 - 1.0
        G = self.G
        num_ws = G.cfg.num_ws
        k_pred, k_canon = jax.random.split(key)

        pose_out = resnet34_apply(train_state["pose"], target_255)
        pred_ext, pred_cam = assemble_camera(
            pose_out, train_state["translation"], cfg.camera_mode,
            cfg.radius, self.intrinsic.reshape(9))

        ws = jnp.tile(train_state["w"] + w_noise, (1, num_ws, 1))
        gen_params = merge_noise(self.base_params, train_state["noise"])

        # Predicted + canonical views in ONE batched render (N=2): the
        # marcher/importance fixed costs amortize and the tri-plane
        # gathers pipeline across both views. The canonical half uses the
        # DETACHED latent (w_projector.py:203-205) — pose/noise still
        # receive gradient through it, matching the reference's separate
        # call.
        ws_both = jnp.concatenate([ws, jax.lax.stop_gradient(ws)], axis=0)
        cams = jnp.concatenate([pred_cam, self.canonical_cam], axis=0)

        def render(p, w, c, k, sr_max_res):
            return G.synthesis(p, w, c, noise_mode="const", det=False,
                               key=k, force_fp32=cfg.render_fp32,
                               sr_max_res=sr_max_res)

        if cfg.remat_render:
            render = jax.checkpoint(render, static_argnums=(4,))
        if cfg.batch_views:
            assert cfg.canon_sr_max_res is None, \
                "canon_sr_max_res needs sequential renders (batch_views=False)"
            out = render(gen_params, ws_both, cams, k_pred, None)
            pred_depth = out["image_depth"][:1]
            pred_images_255 = out["image"][:1] * 127.5 + 128
            canon_image = out["image"][1:]
        else:
            pred = render(gen_params, ws, pred_cam, k_pred, None)
            canon = render(gen_params, jax.lax.stop_gradient(ws),
                           self.canonical_cam, k_canon,
                           cfg.canon_sr_max_res)
            pred_depth = pred["image_depth"]
            pred_images_255 = pred["image"] * 127.5 + 128
            canon_image = canon["image"]

        # Both warp-feature inputs are [-1, 1] (the reference feeds the
        # raw target and the raw canonical render, warping_loss.py:37-38
        # + w_projector.py:109) — NOT the 0-255 lpips/pose scaling.
        vgg_fn = partial(warping_features, self.vgg_params)
        warp_loss, _ = calc_warping_loss(
            canon_image, vgg_fn, pred_ext, self.init_ext,
            self.intrinsic[None], pred_depth, target_warp)

        # LPIPS feature distance at the target's resolution
        # (w_projector.py:215-218: pred is area-shrunk to the 256 target).
        t_res = target_255.shape[-1]
        if pred_images_255.shape[-1] > t_res:
            pred_images_255 = area_downsample(pred_images_255, t_res)
        elif pred_images_255.shape[-1] < t_res:
            # Tiny test configs render below the target res; upsample to
            # match the target feature grid (no reference counterpart —
            # SR output always >= 256 there).
            n, c = pred_images_255.shape[:2]
            pred_images_255 = jax.image.resize(
                pred_images_255, (n, c, t_res, t_res), method="linear")
        synth_feats = lpips_features(self.vgg_params, self.lpips_head,
                                     pred_images_255)
        dist = jnp.sum(jnp.square(target_lpips_feats - synth_feats))

        reg = noise_regularization(train_state["noise"])
        loss = dist + reg * cfg.regularize_noise_weight + warp_loss
        return loss, {"dist": dist, "warp": warp_loss, "noise_reg": reg,
                      "pred_cam": pred_cam}

    # -- stepping -----------------------------------------------------------

    def _make_step(self, target_255, target_lpips_feats, w_std,
                   preheat: bool, target_warp=None):
        """Single-image step: the batched step with its target bound."""
        step = self._make_step_batched(w_std, preheat)

        def bound(carry, step_idx):
            return step(carry, step_idx, target_255, target_lpips_feats,
                        target_warp)

        return bound

    def project(self, key, target_255, num_steps=None, snapshot_fn=None,
                snapshot_every=10, target_full=None):
        """Run the full two-phase projection.

        ``snapshot_fn(step, train_state, target_255)`` — when given, the
        scans run in ``snapshot_every``-step chunks and the callback fires
        at each boundary (w_projector.py:193-212's visualize_opt_process;
        see tgi.utils.opt_viz.make_projection_snapshotter). The hot loop
        stays fused on device; only chunk boundaries sync to host.

        ``target_full``: optional [1, 3, R, R] target in [-1, 1] at full
        resolution for the warp loss (the reference feeds the raw target,
        w_projector.py:109); defaults to the 256-res target rescaled.

        Returns (ws [1, num_ws, D], camera [1, 25], final_state, metrics).
        """
        cfg = self.cfg
        num_steps = num_steps or cfg.num_steps
        k_init, k_loop = jax.random.split(key)
        target_255 = jnp.asarray(target_255, jnp.float32)
        target_warp = None if target_full is None else \
            jnp.asarray(target_full, jnp.float32)
        target_feats = lpips_features(self.vgg_params, self.lpips_head,
                                      target_255)

        train_state, opt_states, w_std = self.init_state(k_init, target_255)

        preheat_steps = min(cfg.cam_preheat_steps, num_steps)
        step_a = self._make_step(target_255, target_feats, w_std,
                                 preheat=True, target_warp=target_warp)
        step_b = self._make_step(target_255, target_feats, w_std,
                                 preheat=False, target_warp=target_warp)

        # Chunk bounds compose snapshots with the dispatch-time safety
        # bound: a large snapshot_every must not silently reinstate the
        # long single dispatch dispatch_chunk exists to prevent
        # (CLAUDE.md: >40-60 s dispatches kill the axon TPU worker).
        snap = snapshot_every if snapshot_fn is not None else None
        chunk = cfg.dispatch_chunk if snap is None else (
            snap if cfg.dispatch_chunk is None
            else min(snap, cfg.dispatch_chunk))
        carry = (train_state, opt_states, k_loop)
        if chunk is None:
            carry, metrics_a = jax.lax.scan(step_a, carry,
                                            jnp.arange(preheat_steps))
            metrics_b = None
            if num_steps > preheat_steps:
                carry, metrics_b = jax.lax.scan(
                    step_b, carry, jnp.arange(preheat_steps, num_steps))
        else:
            # Chunked execution: segments never straddle the preheat/joint
            # boundary, so only two scan programs compile (one per phase,
            # per distinct chunk length). Used for snapshot callbacks AND
            # for dispatch_chunk (bounded per-dispatch execution time).
            bounds = sorted({0, preheat_steps, num_steps}
                            | set(range(0, num_steps, max(chunk, 1))))
            bounds = [b for b in bounds if b <= num_steps]
            chunks_a, chunks_b = [], []
            for a, b in zip(bounds[:-1], bounds[1:]):
                step = step_a if a < preheat_steps else step_b
                carry, m = jax.lax.scan(step, carry, jnp.arange(a, b))
                (chunks_a if a < preheat_steps else chunks_b).append(m)
                # Snapshots fire on their own cadence (plus the phase
                # boundary and the end), not at every dispatch chunk.
                if snapshot_fn is not None and (
                        b % snap == 0 or b in (preheat_steps, num_steps)):
                    snapshot_fn(b, carry[0], target_255)
                elif cfg.dispatch_chunk is not None:
                    # True host sync: bounds relay-busy time between
                    # dispatches and surfaces a worker crash at the exact
                    # chunk (block_until_ready alone can return at
                    # dispatch time through the axon relay, CLAUDE.md).
                    np.asarray(carry[0]["w"])[0, 0, 0]
            cat = lambda ms: jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs), *ms)
            metrics_a = cat(chunks_a) if chunks_a else None
            metrics_b = cat(chunks_b) if chunks_b else None
        train_state, opt_states, _ = carry

        # Final camera from the tuned pose head (no w noise).
        pose_out = resnet34_apply(train_state["pose"], target_255)
        _, pred_cam = assemble_camera(
            pose_out, train_state["translation"], cfg.camera_mode,
            cfg.radius, self.intrinsic.reshape(9))
        ws = jnp.tile(train_state["w"], (1, self.G.cfg.num_ws, 1))
        if metrics_a is None:
            metrics = metrics_b
        elif metrics_b is None:
            metrics = metrics_a
        else:
            metrics = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b]), metrics_a, metrics_b)
        return ws, pred_cam, train_state, metrics

    # -- batched inversion ----------------------------------------------

    def project_batch(self, key, targets_255, num_steps=None,
                      targets_warp=None, pose_params_b=None):
        """Invert a BATCH of targets simultaneously (BASELINE.json config
        5, 'throughput-oriented batch inversion').

        The reference is strictly per-image — each image fine-tunes its
        own pose CNN and noise buffers (w_projector.py:62, 120-131). The
        same semantics are preserved by vmapping the ENTIRE per-image
        optimization state (w, noise, translation, pose net, Adam moments)
        over the batch; the frozen generator/VGG weights stay shared and
        unmapped, so the convolutions batch across images on the MXU.

        Args:
            key: PRNG key.
            targets_255: [B, 1, 3, 256, 256] or [B, 3, 256, 256].
            targets_warp: optional [B, 1, 3, R, R] full-resolution
                [-1, 1] targets for the warp loss (per-image counterpart
                of ``project``'s ``target_full``).
            pose_params_b: optional PER-IMAGE pose-net params (a pytree
                whose leaves carry a leading [B] axis) replacing the
                shared ``self.pose_params`` as each image's starting
                estimator — e.g. selfinv's per-target aimed nets. Safe
                to substitute after init: Adam states are value-
                independent zeros of the same tree.

        Returns (ws [B, 1, num_ws, D], cams [B, 1, 25], states, metrics).
        """
        cfg = self.cfg
        num_steps = num_steps or cfg.num_steps
        if targets_255.ndim == 4:
            targets_255 = targets_255[:, None]
        B = targets_255.shape[0]
        targets_255 = jnp.asarray(targets_255, jnp.float32)
        if targets_warp is not None:
            targets_warp = jnp.asarray(targets_warp, jnp.float32)
            if targets_warp.ndim == 4:
                targets_warp = targets_warp[:, None]
        k_init, k_loop = jax.random.split(key)

        target_feats = jax.vmap(
            lambda t: lpips_features(self.vgg_params, self.lpips_head, t)
        )(targets_255)

        init_keys = jax.random.split(k_init, B)
        train_state, opt_states, w_std = jax.vmap(self.init_state)(
            init_keys, targets_255)
        w_std = w_std[0]     # identical across the batch (same generator)
        if pose_params_b is not None:
            train_state = {**train_state, "pose": pose_params_b}

        preheat_steps = min(cfg.cam_preheat_steps, num_steps)
        loop_keys = jax.random.split(k_loop, B)

        def scan_phase(preheat, carry, start, stop):
            step = self._make_step_batched(w_std, preheat)
            def body(c, i):
                (ts, os, keys) = c
                if targets_warp is None:
                    (ts, os, keys), m = jax.vmap(
                        step, in_axes=((0, 0, 0), None, 0, 0))(
                            (ts, os, keys), i, targets_255, target_feats)
                else:
                    (ts, os, keys), m = jax.vmap(
                        step, in_axes=((0, 0, 0), None, 0, 0, 0))(
                            (ts, os, keys), i, targets_255, target_feats,
                            targets_warp)
                return (ts, os, keys), m
            if start >= stop:
                # Zero-step phase (e.g. cam_preheat_steps=0): a length-0
                # scan yields the carry unchanged plus correctly-shaped
                # empty metrics (the chunk loop below would collect no
                # metric trees and tree_map() over zero trees raises).
                return jax.lax.scan(body, carry, jnp.arange(start, stop))
            # dispatch_chunk bounds per-dispatch execution time — with B
            # images per step this matters even more than single-image
            # (see ProjectorConfig.dispatch_chunk).
            chunk = cfg.dispatch_chunk or (stop - start)
            ms = []
            for a in range(start, stop, max(chunk, 1)):
                b = min(a + chunk, stop)
                carry, m = jax.lax.scan(body, carry, jnp.arange(a, b))
                ms.append(m)
                if cfg.dispatch_chunk is not None:
                    np.asarray(carry[0]["w"])[0, 0, 0, 0]  # host sync
            if len(ms) == 1:
                return carry, ms[0]
            return carry, jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0), *ms)

        carry = (train_state, opt_states, loop_keys)
        carry, metrics = scan_phase(True, carry, 0, preheat_steps)
        if num_steps > preheat_steps:
            carry, metrics_b = scan_phase(False, carry, preheat_steps,
                                          num_steps)
            metrics = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=0),
                metrics, metrics_b)
        train_state, opt_states, _ = carry

        def finalize(ts, target):
            pose_out = resnet34_apply(ts["pose"], target)
            _, cam = assemble_camera(pose_out, ts["translation"],
                                     cfg.camera_mode, cfg.radius,
                                     self.intrinsic.reshape(9))
            return jnp.tile(ts["w"], (1, self.G.cfg.num_ws, 1)), cam

        ws, cams = jax.vmap(finalize)(train_state, targets_255)
        return ws, cams, train_state, metrics

    def _make_step_batched(self, w_std, preheat):
        """Per-image step with (target, feats) as explicit args so it can
        be vmapped over the batch."""
        cfg = self.cfg
        opts = self._optimizers()
        grad_fn = jax.grad(self._loss, has_aux=True)

        def step(carry, step_idx, target_255, target_feats,
                 target_warp=None):
            train_state, opt_states, key = carry
            key, k_loss, k_wnoise = jax.random.split(key, 3)

            t = ((step_idx - cfg.cam_preheat_steps)
                 / max(cfg.num_steps - cfg.cam_preheat_steps, 1))
            w_noise_scale = (w_std * cfg.initial_noise_factor
                             * jnp.maximum(0.0, 1.0 - t
                                           / cfg.noise_ramp_length) ** 2)
            lr_ramp = jnp.minimum(1.0, (1.0 - t) / cfg.lr_rampdown_length)
            lr_ramp = 0.5 - 0.5 * jnp.cos(lr_ramp * jnp.pi)
            lr_ramp = lr_ramp * jnp.minimum(1.0, t / cfg.lr_rampup_length)
            lr = cfg.first_inv_lr * lr_ramp

            w_noise = (jnp.zeros_like(train_state["w"]) if preheat else
                       jax.random.normal(k_wnoise, train_state["w"].shape)
                       * w_noise_scale)
            grads, aux = grad_fn(train_state, target_255, target_feats,
                                 w_noise, k_loss, target_warp)

            cam_updates, cam_state = opts["cam"].update(
                grads["pose"], opt_states["cam"], train_state["pose"])
            pose = optax.apply_updates(train_state["pose"], cam_updates)
            tr_updates, tr_state = opts["trans"].update(
                grads["translation"], opt_states["trans"],
                train_state["translation"])
            translation = optax.apply_updates(train_state["translation"],
                                              tr_updates)
            if preheat:
                w, noise, w_state = (train_state["w"], train_state["noise"],
                                     opt_states["w"])
            else:
                w_state_in = opt_states["w"]._replace(
                    hyperparams={**opt_states["w"].hyperparams,
                                 "learning_rate": lr})
                w_updates, w_state = opts["w"].update(
                    {"w": grads["w"], "noise": grads["noise"]}, w_state_in,
                    {"w": train_state["w"], "noise": train_state["noise"]})
                merged = optax.apply_updates(
                    {"w": train_state["w"], "noise": train_state["noise"]},
                    w_updates)
                w, noise = merged["w"], merged["noise"]

            noise = {k: normalize_noise(v) for k, v in noise.items()}
            new_state = {"w": w, "noise": noise, "translation": translation,
                         "pose": pose}
            new_opts = {"w": w_state, "cam": cam_state, "trans": tr_state}
            metrics = {"loss": aux["dist"] + aux["warp"],
                       "dist": aux["dist"], "warp": aux["warp"]}
            return (new_state, new_opts, key), metrics

        return step
