"""Self-bootstrapped auxiliary nets for the closed-loop inversion gate.

The reference pipeline depends on pretrained networks: a ResNet-34 pose
estimator (trained on a pseudo-dataset RENDERED FROM THE GENERATOR
ITSELF — scripts/gen_pseudo_dataset.py + scripts/train_pose_estimator.py),
ImageNet-pretrained VGG-16s for the LPIPS distance and the warping-loss
features (w_projector.py:50-58), and an e4e encoder providing the
target-aware starting latent (w_projector.py:99-115). None of those
weights are mountable in this environment, and the measured failure
modes of running the gate on random-init stand-ins are:

  * a random VGG is pose-UNinformative — at the gate's start state a
    3 deg pose change moves dist+warp by ~1% with garbage gradient
    direction, so the camera random-walks (3 -> 80 deg) while w/noise
    compensate (scripts/probe_pose_divergence.py, v5e 2026-08-20);
  * without e4e the start render is the mean face, so the perceptual
    distance is saturated by content mismatch exactly when the
    camera-only preheat needs it to be about pose (probe_bootstrap_gate:
    2.4 -> 40 deg during the 50 preheat steps even with a trained VGG).

The honest repair is the reference's own recipe, applied to every aux
net: the generator is a labeled-data factory. This module renders an
in-memory pseudo-dataset (image, extrinsic, w) and

  1. trains the pose ResNet on it exactly as the reference protocol
     does (geodesic rotation loss + 10x translation MSE,
     tgi/apps/pose_pipeline.py::pose_loss);
  2. trains the SAME VGG-16 the warp/LPIPS losses read, with
     pose + latent regression heads hung off the five LPIPS stages —
     after which its conv features are pose- and identity-informative
     on the generator's image manifold (the property the reference
     gets from ImageNet pretraining);
  3. recycles the trained latent head as the e4e substitute:
     e4e_encode(target) = w_hat(target) - mean_w, so projection starts
     content-close to the target as in the reference.

No external data or weights are involved; every trained parameter is a
deterministic function of the generator + PRNG key.

TPU notes: the trainers keep the whole dataset device-resident (images
as uint8, the reference's own PNG precision) and fuse ``chunk`` steps
per dispatch in one lax.scan — per-step host dispatch through the axon
relay costs ~0.5 s, ~10x the step itself (measured; cf. CLAUDE.md
timing traps). Datasets/params are passed as jit ARGS, never closure
constants (>100 MB constants exceed the relay request limit).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tgi.apps.pose_pipeline import pose_loss
from tgi.losses.warp import area_downsample
from tgi.models.vgg import (IMAGENET_MEAN, IMAGENET_STD, LPIPS_CHANNELS,
                            LPIPS_STAGES, vgg16_features)
from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                pack_camera)


def make_pseudo_dataset(G, params, key, *, num_images=512, batch=8,
                        chain=4, yaw_std=0.65, pitch_std=0.3, radius=2.7,
                        fov=18.837, truncation_psi=0.7):
    """In-memory variant of tgi.apps.pose_pipeline.gen_pseudo_dataset
    (reference: scripts/gen_pseudo_dataset.py:105-206) that also keeps
    each sample's w for the latent-regression head.

    ``chain`` render batches run inside one dispatch (lax.scan) to
    amortize the relay round-trip; dispatch length stays ~1 s.

    Returns dict of host arrays: images_255 [N,3,256,256] (0..255),
    exts [N,4,4], ws [N,w_dim].
    """
    intr = fov_to_intrinsics(fov)
    cond_cam = pack_camera(
        look_at_pose(np.pi / 2, np.pi / 2, jnp.zeros(3),
                     radius=radius)[None], intr)

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

    @jax.jit
    def render_chain(ks):
        return jax.lax.scan(lambda _, k: (None, render_batch(k)),
                            None, ks)[1]

    n_batches = (num_images + batch - 1) // batch
    all_keys = jax.random.split(key, n_batches)
    imgs, exts, ws = [], [], []
    for g in range(0, n_batches, chain):
        i, e, w = render_chain(all_keys[g:g + chain])
        imgs.append(np.asarray(i).reshape(-1, *i.shape[2:]))
        exts.append(np.asarray(e).reshape(-1, 4, 4))
        ws.append(np.asarray(w).reshape(-1, w.shape[-1]))
    n = num_images
    return {"images_255": np.concatenate(imgs)[:n],
            "exts": np.concatenate(exts)[:n],
            "ws": np.concatenate(ws)[:n]}


def _vgg_stage_acts(vgg_params, images_255):
    x = images_255 / 255.0
    x = (x - IMAGENET_MEAN[None, :, None, None]) \
        / IMAGENET_STD[None, :, None, None]
    return vgg16_features(vgg_params, x, outputs=LPIPS_STAGES)


def _vgg_embed(vgg_params, images_255, acts=None):
    """Globally pooled concat of the five LPIPS-stage activations —
    trains every conv the lpips/warp features later read."""
    if acts is None:
        acts = _vgg_stage_acts(vgg_params, images_255)
    pooled = [acts[i].mean(axis=(2, 3)) for i in LPIPS_STAGES]
    return jnp.concatenate(pooled, axis=-1)       # [N, sum(stage ch)]


def vgg_head_init(key, w_dim=512, d=None, c15=256):
    d = d if d is not None else sum(LPIPS_CHANNELS)
    kq, kw, kr = jax.random.split(key, 3)
    return {
        "quat": {"weight": jax.random.normal(kq, (d, 4)) * (1 / d) ** 0.5,
                 "bias": jnp.zeros((4,))},
        "w": {"weight": jax.random.normal(kw, (d, w_dim)) * (1 / d) ** 0.5,
              "bias": jnp.zeros((w_dim,))},
        # Dense head: 1x1 conv from the layer-15 feature map (the exact
        # layer warping_features reads) back to RGB. Without it the
        # global-pooled pose/latent objectives are solvable with
        # spatially FLAT features, and the warp loss — whose pose signal
        # is feature-map alignment — gets no anchor (measured: pose
        # drifted 13 -> 43 deg with global heads only).
        "recon": {"weight": jax.random.normal(kr, (3, c15, 1, 1))
                  * (1 / c15) ** 0.5,
                  "bias": jnp.zeros((3,))},
    }


def _val_split(n, batch):
    """~10% held-out (>= one batch when affordable), never starving the
    train split (same policy as pose_pipeline.train_pose_estimator)."""
    return min(max(batch, n // 10), n // 2)


def _dataset_device(dataset):
    imgs = jnp.asarray(np.clip(np.round(dataset["images_255"]), 0, 255)
                       .astype(np.uint8))
    return imgs, jnp.asarray(dataset["exts"])


def train_pose_bootstrap(pose_params, dataset, *, mode="quat", lr=1e-4,
                         batch=32, steps=3000, chunk=50, key=None,
                         log=None):
    """Scan-fused pose-estimator training on a device-resident dataset.

    Loss/semantics identical to the reference-parity trainer
    (tgi/apps/pose_pipeline.py::train_pose_estimator ==
    scripts/train_pose_estimator.py); differences, deliberate for the
    on-chip bootstrap: minibatches are drawn with jax.random inside the
    scan, images live on device as uint8 (PNG precision — the reference
    trains from PNGs), and the final params are returned instead of
    best-val checkpointing. Runs ``ceil(steps/chunk)*chunk`` steps.

    Returns (params, {"val_loss", "val_rot_deg"}).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    images, exts = _dataset_device(dataset)
    n = images.shape[0]
    batch = min(batch, max(1, n // 2))
    n_val = _val_split(n, batch)
    chunk = min(chunk, steps)

    opt = optax.adam(lr)
    opt_state = opt.init(pose_params)

    @jax.jit
    def run_chunk(p, os_, k, imgs, ext):
        def body(carry, _):
            p, os_, k = carry
            k, kb = jax.random.split(k)
            idx = jax.random.randint(kb, (batch,), n_val, n)
            (l, _), g = jax.value_and_grad(pose_loss, has_aux=True)(
                p, imgs[idx].astype(jnp.float32), ext[idx], mode)
            upd, os_ = opt.update(g, os_, p)
            return (optax.apply_updates(p, upd), os_, k), l
        (p, os_, _), ls = jax.lax.scan(body, (p, os_, k), None,
                                       length=chunk)
        return p, os_, ls.mean()

    for c in range((steps + chunk - 1) // chunk):
        pose_params, opt_state, lmean = run_chunk(
            pose_params, opt_state, jax.random.fold_in(key, c),
            images, exts)
        if log and (c % 5 == 0 or (c + 1) * chunk >= steps):
            log(f"pose step {(c + 1) * chunk}: loss {float(lmean):.4f}")

    @jax.jit
    def val(p, imgs, ext):
        from tgi.apps.pose_pipeline import head_to_rotmat
        im = imgs[:n_val].astype(jnp.float32)
        loss, _ = pose_loss(p, im, ext[:n_val], mode)
        from tgi.models.pose_resnet import resnet34_apply
        rot = head_to_rotmat(resnet34_apply(p, im), mode)
        tr = jnp.einsum("nij,nij->n", rot, ext[:n_val, :3, :3])
        deg = jnp.degrees(jnp.arccos(jnp.clip((tr - 1) / 2, -1, 1)))
        return loss, deg.mean()

    vloss, vdeg = val(pose_params, images, exts)
    return pose_params, {"val_loss": float(vloss),
                         "val_rot_deg": float(vdeg)}


def train_vgg_bootstrap(vgg_params, dataset, *, steps=800, batch=16,
                        lr=1e-4, chunk=50, key=None, log_every=200,
                        log=None):
    """Scan-fused training of the projection VGG with pose (geodesic) +
    latent (MSE) regression heads on the pseudo-dataset.

    The conv stack's features become discriminative for exactly the
    factors the warp/LPIPS losses need gradients in (camera pose, image
    content); the latent head doubles as the gate's e4e substitute.

    Returns {"vgg", "heads", "w_mu", "w_sd"}.
    """
    from tgi.apps.pose_pipeline import geodesic_rotation_loss
    from tgi.render.cameras import quaternion_to_rotmat

    key = key if key is not None else jax.random.PRNGKey(0)
    images, exts = _dataset_device(dataset)
    ws = jnp.asarray(dataset["ws"])
    w_mu = ws.mean(axis=0, keepdims=True)
    w_sd = ws.std() + 1e-8
    ws_n = (ws - w_mu) / w_sd
    n = images.shape[0]
    batch = min(batch, n)
    chunk = min(chunk, steps)

    acts0 = _vgg_stage_acts(vgg_params, images[:1].astype(jnp.float32))
    d = _vgg_embed(vgg_params, None, acts=acts0).shape[-1]
    heads = vgg_head_init(jax.random.fold_in(key, 1), w_dim=ws.shape[-1],
                          d=d, c15=acts0[15].shape[1])
    trainable = {"vgg": vgg_params, "heads": heads}
    opt = optax.adam(lr)
    opt_state = opt.init(trainable)

    def loss_fn(tr, imgs, ext, w_t):
        acts = _vgg_stage_acts(tr["vgg"], imgs)
        emb = _vgg_embed(tr["vgg"], None, acts=acts)
        q = emb @ tr["heads"]["quat"]["weight"] \
            + tr["heads"]["quat"]["bias"]
        l_rot = geodesic_rotation_loss(quaternion_to_rotmat(q),
                                       ext[:, :3, :3])
        w_hat = emb @ tr["heads"]["w"]["weight"] + tr["heads"]["w"]["bias"]
        l_w = jnp.mean(jnp.square(w_hat - w_t))
        # Dense spatial anchor: reconstruct the (downsampled) image from
        # the layer-15 feature map via 1x1 conv — forces per-position
        # features to encode local appearance, which is what the warp
        # loss aligns and what makes the LPIPS distance pose-sharp.
        f15 = acts[15]
        rec = jax.lax.conv_general_dilated(
            f15, tr["heads"]["recon"]["weight"], (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW")) \
            + tr["heads"]["recon"]["bias"][None, :, None, None]
        tgt = area_downsample(imgs / 127.5 - 1.0, f15.shape[-1])
        l_rec = jnp.mean(jnp.square(rec - tgt))
        return l_rot + l_w + l_rec, {"rot": l_rot, "w": l_w,
                                     "rec": l_rec}

    @jax.jit
    def run_chunk(tr, os_, k, imgs, ext, w_t):
        def body(carry, _):
            tr, os_, k = carry
            k, kb = jax.random.split(k)
            idx = jax.random.randint(kb, (batch,), 0, n)
            (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                tr, imgs[idx].astype(jnp.float32), ext[idx], w_t[idx])
            upd, os_ = opt.update(g, os_, tr)
            return (optax.apply_updates(tr, upd), os_, k), (
                l, aux["rot"], aux["w"], aux["rec"])
        (tr, os_, _), ms = jax.lax.scan(body, (tr, os_, k), None,
                                        length=chunk)
        return tr, os_, jax.tree_util.tree_map(jnp.mean, ms)

    for c in range((steps + chunk - 1) // chunk):
        trainable, opt_state, (l, lr_, lw, lrec) = run_chunk(
            trainable, opt_state, jax.random.fold_in(key, 100 + c),
            images, exts, ws_n)
        if log and ((c * chunk) % log_every < chunk
                    or (c + 1) * chunk >= steps):
            log(f"vgg_bootstrap step {(c + 1) * chunk}: "
                f"loss {float(l):.4f} rot {float(lr_):.4f} "
                f"w {float(lw):.4f} rec {float(lrec):.4f}")
    return {"vgg": trainable["vgg"], "heads": trainable["heads"],
            "w_mu": w_mu, "w_sd": w_sd}


def make_e4e_encode(vgg_params, heads, w_mu, w_sd):
    """Build the e4e substitute from the trained latent head.

    The projector adds the encoder output to its own mean-w
    (w_projector.py:99-115: start_w = mean_w + e4e(target)), so the
    head's prediction is returned as a DELTA against the pseudo-dataset
    w mean — w_mu estimates the same truncated mapping mean the
    projector computes, so start_w lands at the predicted latent.
    """
    def e4e_encode(target_255):
        emb = _vgg_embed(vgg_params, target_255)
        w_hat_n = emb @ heads["w"]["weight"] + heads["w"]["bias"]
        # predicted w = w_hat_n * w_sd + w_mu; the delta vs the mean is
        # just the unnormalized head output (w_mu cancels).
        return w_hat_n * w_sd
    return e4e_encode


def bootstrap_aux_nets(G, params, *, key, pose_params, vgg_params,
                       num_images=1024, pose_steps=2000, vgg_steps=800,
                       pose_batch=32, vgg_batch=16, pose_mode="quat",
                       log=None):
    """Pseudo-dataset + pose/VGG training + e4e substitute.

    Returns (pose_params, vgg_params, e4e_encode, report dict).
    """
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
    pose_trained, pose_val = train_pose_bootstrap(
        pose_params, ds, mode=pose_mode, batch=pose_batch,
        steps=pose_steps, key=kp, log=log)
    t_pose = time.perf_counter()
    if log:
        log(f"pose estimator: {pose_steps} steps in {t_pose - t_ds:.1f}s "
            f"(val loss {pose_val['val_loss']:.4f}, "
            f"val rot {pose_val['val_rot_deg']:.2f} deg)")

    vt = train_vgg_bootstrap(vgg_params, ds, steps=vgg_steps,
                             batch=vgg_batch, key=kv, log=log)
    t_vgg = time.perf_counter()
    if log:
        log(f"vgg bootstrap: {vgg_steps} steps in {t_vgg - t_pose:.1f}s")

    e4e_encode = make_e4e_encode(vt["vgg"], vt["heads"], vt["w_mu"],
                                 vt["w_sd"])
    report = {
        "dataset_s": round(t_ds - t0, 1),
        "pose_train_s": round(t_pose - t_ds, 1),
        "vgg_train_s": round(t_vgg - t_pose, 1),
        "pose_val_loss": pose_val["val_loss"],
        "pose_val_rot_deg": pose_val["val_rot_deg"],
    }
    return pose_trained, vt["vgg"], e4e_encode, report
