"""Pose-estimator pipeline: pseudo-dataset generation + training.

Behavioral parity targets:
  scripts/gen_pseudo_dataset.py:105-206 — render EG3D samples at random
    yaw/pitch/roll with canonical conditioning, save images + extrinsics.
  scripts/train_pose_estimator.py:25-259 — ResNet-34 on the pseudo data
    with geodesic rotation loss + 10x translation MSE + anti-diagonal
    regularizer, Adam, periodic validation/best-model checkpointing.

TPU-first: generation renders camera batches through one jitted call;
training is a jitted step with the batch sharded over the mesh 'data'
axis (replacing the reference's DataLoader workers + single-GPU step).
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tgi.models.pose_resnet import resnet34_apply
from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                pack_camera, quaternion_to_rotmat,
                                rot6d_to_rotmat, euler_to_rotmat)
from tgi.utils.image import save_image


def gen_pseudo_dataset(G, params, outdir, *, num_images=1000, batch=8,
                       key=None, yaw_std=0.65, pitch_std=0.3,
                       radius=2.7, fov=18.837, truncation_psi=0.7):
    """Render (image, extrinsic) pairs; writes pngs + pseudo_cam_gt.txt."""
    os.makedirs(outdir, exist_ok=True)
    key = key if key is not None else jax.random.PRNGKey(0)
    intr = fov_to_intrinsics(fov)
    cond_cam = pack_camera(
        look_at_pose(np.pi / 2, np.pi / 2, jnp.zeros(3), radius=radius)[None],
        intr)

    @jax.jit
    def render_batch(k):
        kz, ky, kp = jax.random.split(k, 3)
        z = jax.random.normal(kz, (batch, G.cfg.z_dim))
        yaw = np.pi / 2 + jax.random.normal(ky, (batch,)) * yaw_std
        pitch = np.pi / 2 + jax.random.normal(kp, (batch,)) * pitch_std
        pitch = jnp.clip(pitch, 1e-5, np.pi - 1e-5)
        cams = look_at_pose(yaw, pitch, jnp.zeros(3), radius=radius)
        c = pack_camera(cams, intr)
        ws = G.mapping(params, z, jnp.tile(cond_cam, (batch, 1)),
                       truncation_psi=truncation_psi, truncation_cutoff=14)
        img = G.synthesis(params, ws, c, det=True)["image"]
        return img, cams

    lines = []
    idx = 0
    for b in range((num_images + batch - 1) // batch):
        imgs, cams = render_batch(jax.random.fold_in(key, b))
        imgs, cams = np.asarray(imgs), np.asarray(cams)
        for i in range(min(batch, num_images - idx)):
            fname = f"{idx:06d}.png"
            save_image(os.path.join(outdir, fname), imgs[i])
            lines.append(fname + " " +
                         " ".join(f"{v:.8f}" for v in cams[i].reshape(-1)))
            idx += 1
    with open(os.path.join(outdir, "pseudo_cam_gt.txt"), "w") as f:
        f.write("\n".join(lines))
    return idx


def geodesic_rotation_loss(r1, r2, eps=1e-7):
    """arccos((tr(R1 R2ᵀ) - 1)/2) (train_pose_estimator.py:241-254)."""
    m = jnp.einsum("bij,bkj->bik", r1, r2)
    tr = m[:, 0, 0] + m[:, 1, 1] + m[:, 2, 2]
    cos = jnp.clip((tr - 1) / 2, -1 + eps, 1 - eps)
    return jnp.arccos(cos).mean()


def head_to_rotmat(pred, mode):
    if mode == "quat":
        return quaternion_to_rotmat(pred)
    if mode == "6d":
        return rot6d_to_rotmat(pred)
    return euler_to_rotmat(np.pi / 2 + pred[:, 0], np.pi / 2 + pred[:, 1])


def pose_loss(params, images, gt_ext, mode):
    """Geodesic rot + 10x translation MSE + anti-diagonal reg
    (train_pose_estimator.py:132-141)."""
    pred = resnet34_apply(params, images)
    pred_rot = head_to_rotmat(pred, mode)
    gt_rot = gt_ext[:, :3, :3]
    gt_trans = gt_ext[:, :3, 3]
    pred_trans = -2.7 * pred_rot[:, :3, 2]
    loss_rot = geodesic_rotation_loss(pred_rot, gt_rot)
    loss_trans = jnp.mean(jnp.square(pred_trans - gt_trans)) * 10
    anti_diag = (jnp.abs(pred_rot[:, 0, 2]) + jnp.abs(pred_rot[:, 2, 0])
                 ).mean() * 1e-10
    return loss_rot + loss_trans + anti_diag, {"rot": loss_rot,
                                               "trans": loss_trans}


def train_pose_estimator(pose_params, dataset, *, mode="quat", lr=1e-4,
                         batch=32, steps=10_000, val_every=1000,
                         ckpt_dir=None, key=None):
    """dataset: (images [N,3,H,W] float 0..255, extrinsics [N,4,4]).

    Returns (best_params, history). The jitted step shards over the mesh
    'data' axis when run under a Mesh context.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    images, exts = dataset
    n = images.shape[0]
    # Val split: ~10% (>= one batch when the dataset affords it), never
    # starving the train split on tiny datasets.
    n_val = min(max(batch, n // 10), n // 2)
    train_idx, val_idx = np.arange(n_val, n), np.arange(n_val)
    opt = optax.adam(lr)
    opt_state = opt.init(pose_params)

    @jax.jit
    def update(params, opt_state, imgs, ext):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: pose_loss(p, imgs, ext, mode), has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    best = (np.inf, pose_params)
    history = []
    rng = np.random.RandomState(0)
    for step in range(steps):
        idx = rng.choice(train_idx, batch)
        params_new, opt_state, loss, aux = update(
            pose_params, opt_state, jnp.asarray(images[idx]),
            jnp.asarray(exts[idx]))
        pose_params = params_new
        if (step + 1) % val_every == 0 or step == steps - 1:
            vidx = val_idx[:batch]
            vloss, vaux = jax.jit(pose_loss, static_argnames=("mode",))(
                pose_params, jnp.asarray(images[vidx]),
                jnp.asarray(exts[vidx]), mode)
            history.append({"step": step + 1, "train": float(loss),
                            "val": float(vloss)})
            if float(vloss) < best[0]:
                best = (float(vloss), pose_params)
                if ckpt_dir:
                    from tgi.io import save_checkpoint
                    save_checkpoint(os.path.join(ckpt_dir,
                                                 "pose_best.ckpt"),
                                    pose_params,
                                    metadata={"val_loss": float(vloss)})
    return best[1], history


def load_pseudo_dataset(directory, size=256, limit=None):
    """Parse pseudo_cam_gt.txt + images back into arrays."""
    from tgi.utils.image import load_image
    lines = open(os.path.join(directory, "pseudo_cam_gt.txt")).read()
    imgs, exts = [], []
    for line in lines.strip().split("\n")[:limit]:
        parts = line.split()
        img = load_image(os.path.join(directory, parts[0]), size=size,
                         to_range=(0, 255))
        imgs.append(img[0])
        exts.append(np.asarray([float(v) for v in parts[1:17]],
                               np.float32).reshape(4, 4))
    return np.stack(imgs), np.stack(exts)
