"""Self-bootstrapped auxiliary nets for the closed-loop inversion gate.

The reference pipeline depends on three pretrained networks: the
ResNet-34 pose estimator (trained on a pseudo-dataset RENDERED FROM THE
GENERATOR ITSELF — scripts/gen_pseudo_dataset.py +
scripts/train_pose_estimator.py), and ImageNet-pretrained VGG-16s for
the LPIPS distance and the warping-loss features (w_projector.py:50-58).
None of those weights are mountable in this environment, and a
RANDOM-init VGG is measurably pose-UNinformative: at the gate's start
state, a 3 deg pose perturbation changes the projection loss by ~1 part
in 2e6 (scripts/probe_pose_divergence.py, v5e 2026-08-20), so the
camera random-walks on noise gradients while w/noise compensate —
stage-1 pose drifted 3 -> 80 deg with reconstruction still converging.

The honest repair is the reference's own recipe, applied to every aux
net: the generator is a labeled-data factory. This module renders an
in-memory pseudo-dataset (image, extrinsic, w) and

  1. trains the pose ResNet on it exactly as the reference does
     (geodesic rotation loss etc., tgi/apps/pose_pipeline.py), and
  2. trains the SAME VGG-16 used by the warp/LPIPS losses with
     pose + latent regression heads hung off the five LPIPS stages —
     after which its conv features are pose- and identity-informative
     on the generator's image manifold, which is the property the
     reference gets from ImageNet pretraining.

No external data or weights are involved; every trained parameter is a
deterministic function of the generator + PRNG key.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tgi.apps.pose_pipeline import (geodesic_rotation_loss,
                                    train_pose_estimator)
from tgi.losses.warp import area_downsample
from tgi.models.vgg import (IMAGENET_MEAN, IMAGENET_STD, LPIPS_CHANNELS,
                            LPIPS_STAGES, vgg16_features)
from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                pack_camera, quaternion_to_rotmat)


def make_pseudo_dataset(G, params, key, *, num_images=512, batch=8,
                        yaw_std=0.65, pitch_std=0.3, radius=2.7,
                        fov=18.837, truncation_psi=0.7):
    """In-memory variant of tgi.apps.pose_pipeline.gen_pseudo_dataset
    (reference: scripts/gen_pseudo_dataset.py:105-206) that also keeps
    each sample's w for the VGG latent-regression head.

    Returns dict of host arrays: images_255 [N,3,256,256] (0..255),
    exts [N,4,4], ws [N,w_dim].
    """
    intr = fov_to_intrinsics(fov)
    cond_cam = pack_camera(
        look_at_pose(np.pi / 2, np.pi / 2, jnp.zeros(3),
                     radius=radius)[None], intr)

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
                       truncation_psi=truncation_psi,
                       truncation_cutoff=14)
        img = G.synthesis(params, ws, c, det=True)["image"]
        img = jnp.clip(img, -1.0, 1.0)
        if img.shape[-1] > 256:
            img = area_downsample(img, 256)
        return (img + 1.0) * 127.5, cams, ws[:, 0, :]

    imgs, exts, ws = [], [], []
    for b in range((num_images + batch - 1) // batch):
        i, e, w = render_batch(jax.random.fold_in(key, b))
        imgs.append(np.asarray(i))
        exts.append(np.asarray(e))
        ws.append(np.asarray(w))
    n = num_images
    return {"images_255": np.concatenate(imgs)[:n],
            "exts": np.concatenate(exts)[:n],
            "ws": np.concatenate(ws)[:n]}


def _vgg_embed(vgg_params, images_255):
    """Globally pooled concat of the five LPIPS-stage activations —
    trains every conv the lpips/warp features later read."""
    x = images_255 / 255.0
    x = (x - IMAGENET_MEAN[None, :, None, None]) \
        / IMAGENET_STD[None, :, None, None]
    acts = vgg16_features(vgg_params, x, outputs=LPIPS_STAGES)
    pooled = [acts[i].mean(axis=(2, 3)) for i in LPIPS_STAGES]
    return jnp.concatenate(pooled, axis=-1)       # [N, 1472]


def vgg_head_init(key, w_dim=512, d=None):
    d = d if d is not None else sum(LPIPS_CHANNELS)
    kq, kw = jax.random.split(key)
    return {
        "quat": {"weight": jax.random.normal(kq, (d, 4)) * (1 / d) ** 0.5,
                 "bias": jnp.zeros((4,))},
        "w": {"weight": jax.random.normal(kw, (d, w_dim)) * (1 / d) ** 0.5,
              "bias": jnp.zeros((w_dim,))},
    }


def train_vgg_bootstrap(vgg_params, dataset, *, steps=800, batch=16,
                        lr=1e-4, key=None, log_every=200, log=None):
    """Train the projection VGG with pose (geodesic) + latent (MSE)
    regression on the pseudo-dataset. Returns trained vgg_params.

    The heads are scaffolding — discarded after training; what matters
    is that the conv stack's features become discriminative for exactly
    the factors the warp/LPIPS losses need gradients in (camera pose,
    image content).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    images = dataset["images_255"]
    exts = dataset["exts"]
    ws = dataset["ws"]
    w_mu = ws.mean(axis=0, keepdims=True)
    w_sd = ws.std() + 1e-8
    ws_n = (ws - w_mu) / w_sd

    # Embed dim from an actual forward (width-scaled VGG twins pool to
    # scaled channel counts).
    d = _vgg_embed(vgg_params, jnp.asarray(images[:1])).shape[-1]
    heads = vgg_head_init(jax.random.fold_in(key, 1), w_dim=ws.shape[-1],
                          d=d)
    trainable = {"vgg": vgg_params, "heads": heads}
    opt = optax.adam(lr)
    opt_state = opt.init(trainable)

    def loss_fn(tr, imgs, ext, w_t):
        emb = _vgg_embed(tr["vgg"], imgs)
        q = emb @ tr["heads"]["quat"]["weight"] \
            + tr["heads"]["quat"]["bias"]
        rot = quaternion_to_rotmat(q)
        l_rot = geodesic_rotation_loss(rot, ext[:, :3, :3])
        w_hat = emb @ tr["heads"]["w"]["weight"] + tr["heads"]["w"]["bias"]
        l_w = jnp.mean(jnp.square(w_hat - w_t))
        return l_rot + l_w, {"rot": l_rot, "w": l_w}

    @jax.jit
    def update(tr, opt_state, imgs, ext, w_t):
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(tr, imgs, ext, w_t)
        updates, opt_state = opt.update(grads, opt_state, tr)
        return optax.apply_updates(tr, updates), opt_state, loss, aux

    rng = np.random.RandomState(17)
    n = images.shape[0]
    for step in range(steps):
        idx = rng.choice(n, batch)
        trainable, opt_state, loss, aux = update(
            trainable, opt_state, jnp.asarray(images[idx]),
            jnp.asarray(exts[idx]), jnp.asarray(ws_n[idx]))
        if log and ((step + 1) % log_every == 0 or step == 0):
            log(f"vgg_bootstrap step {step + 1}: loss {float(loss):.4f} "
                f"rot {float(aux['rot']):.4f} w {float(aux['w']):.4f}")
    return trainable["vgg"]


def bootstrap_aux_nets(G, params, *, key, pose_params, vgg_params,
                       num_images=512, pose_steps=1500, vgg_steps=800,
                       pose_batch=32, vgg_batch=16, pose_mode="quat",
                       log=None):
    """Pseudo-dataset + both trainings; returns
    (pose_params, vgg_params, report dict)."""
    t0 = time.perf_counter()
    kd, kp, kv = jax.random.split(key, 3)
    ds = make_pseudo_dataset(G, params, kd, num_images=num_images)
    t_ds = time.perf_counter()
    if log:
        log(f"pseudo dataset: {num_images} images in {t_ds - t0:.1f}s")

    # A raw random-init ResNet-34 has identity BN stats: activation
    # variance compounds through 34 layers to O(1e3) and the tanh head
    # saturates for every input — gradients are exactly zero and
    # training is a no-op (round-4 gate diagnosis, PERF.md). Calibrate
    # the BN running stats on real data first, as a pretrained net's
    # stats would be.
    from tgi.models.pose_resnet import resnet34_calibrate
    pose_params = resnet34_calibrate(
        pose_params, jnp.asarray(ds["images_255"][:pose_batch]))
    pose_trained, hist = train_pose_estimator(
        pose_params, (ds["images_255"], ds["exts"]), mode=pose_mode,
        batch=min(pose_batch, num_images // 2),
        steps=pose_steps, val_every=max(1, pose_steps // 4), key=kp)
    t_pose = time.perf_counter()
    if log:
        log(f"pose estimator: {pose_steps} steps in {t_pose - t_ds:.1f}s "
            f"(val loss {hist[-1]['val']:.4f})" if hist else "pose done")

    vgg_trained = train_vgg_bootstrap(vgg_params, ds, steps=vgg_steps,
                                      batch=min(vgg_batch, num_images),
                                      key=kv, log=log)
    t_vgg = time.perf_counter()
    if log:
        log(f"vgg bootstrap: {vgg_steps} steps in {t_vgg - t_pose:.1f}s")

    report = {
        "dataset_s": round(t_ds - t0, 1),
        "pose_train_s": round(t_pose - t_ds, 1),
        "vgg_train_s": round(t_vgg - t_pose, 1),
        "pose_val_loss": float(hist[-1]["val"]) if hist else None,
    }
    return pose_trained, vgg_trained, report
