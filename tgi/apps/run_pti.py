"""Main inversion entry point: images -> latents/cameras -> tuned G.

Behavioral parity target: scripts/run_pti.py:16-60 +
training/coaches/single_id_coach.py:25-117. Per image:

  stage 1  joint w + camera projection (tgi.invert.Projector)
  stage 2  pivotal tuning of the generator (tgi.invert.PTICoach)
  outputs  pivot/final reconstruction grids, orbit videos, (ws, cam)
           .npy, optional mesh, optional per-image metrics
           (MSE / LPIPS / MS-SSIM / ID).

Weights: generator from a reference .pkl or tgi checkpoint; pose
estimator / e4e / VGG / ArcFace from torch state-dict .pt files via the
structural converters (random init with a warning when absent, keeping
the pipeline runnable for smoke tests).
"""

from __future__ import annotations

import json
import os
import time

import click
import numpy as np

import jax
import jax.numpy as jnp


def parse_range(s: str):
    out = []
    for part in str(s).split(","):
        if "-" in part:
            a, b = part.split("-")
            out.extend(range(int(a), int(b) + 1))
        else:
            out.append(int(part))
    return out


def load_torch_state_dict(path):
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else v
            for k, v in sd.items()}


def load_any_generator(path, fused_dtype="bfloat16"):
    """Reference .pkl or tgi .ckpt -> (TriPlaneGenerator, params)."""
    from tgi.models import TriPlaneGenerator, GeneratorConfig
    if path.endswith(".pkl"):
        from tgi.io.pickle_import import load_generator
        cfg, params = load_generator(path)
        import dataclasses
        cfg = dataclasses.replace(cfg, fused_dtype=fused_dtype)
        return TriPlaneGenerator(cfg), params
    from tgi.io import load_checkpoint
    data = load_checkpoint(path)
    cfg = GeneratorConfig(**data["config"]) if data["config"] else \
        GeneratorConfig()
    return TriPlaneGenerator(cfg), data["params"]


def list_images(directory):
    exts = (".png", ".jpg", ".jpeg")
    return sorted(os.path.join(directory, f) for f in os.listdir(directory)
                  if f.lower().endswith(exts))


def run_pti(image_dir, out_dir, *, G, gen_params, pose_params, vgg_params,
            lpips_head, e4e_params=None, e4e_latent_avg=None,
            arcface_params=None,
            alex_params=None, alex_head=None, lpips_type="alex",
            use_locality_reg=False, camera_mode="quat", first_inv_steps=400,
            max_pti_steps=400, gen_video=True, gen_mesh=False,
            do_evaluation=False, save_pivot=True, use_last_w_pivots=False,
            visualize_opt=False, tensorboard=False, use_wandb=False,
            seed=0, batch=1):
    """Invert every image in ``image_dir``. Returns per-image results.

    ``batch > 1`` inverts that many images SIMULTANEOUSLY — stage 1 via
    Projector.project_batch, stage 2 via PTICoach.tune_batch — with the
    reference's per-image optimization semantics preserved exactly
    (vmapped per-image states; w_projector.py:62,120-131,
    single_id_coach.py:40-77): numerically equivalent to batch=1 up to
    batched-matmul reassociation, at amortized per-image wall-clock.
    """
    from tgi.invert import (CoachConfig, PTICoach, Projector,
                            ProjectorConfig)
    from tgi.losses.lpips import make_lpips
    from tgi.utils.image import load_image, save_image_grid

    os.makedirs(out_dir, exist_ok=True)
    e4e_encode = None
    if e4e_params is not None:
        from tgi.models.e4e import e4e_encode_w0
        # The RAW encoder output is the start_w delta: pSp2.forward never
        # adds latent_avg (models/e4e/psp.py:47-64; the ckpt's latent_avg
        # is loaded but unused), and the projector adds the generator's
        # truncated w-mean itself (w_projector.py:113-115).
        del e4e_latent_avg

        def e4e_encode(img):
            return e4e_encode_w0(e4e_params, img)

    proj = Projector(G, gen_params, vgg_params, lpips_head, pose_params,
                     ProjectorConfig(num_steps=first_inv_steps,
                                     camera_mode=camera_mode,
                                     # bound B x two-view residual memory
                                     remat_render=batch > 1),
                     e4e_encode=e4e_encode)
    # Stage-2 tuning loss: AlexNet-LPIPS by default, matching the
    # reference's LPIPS(net=hyperparameters.lpips_type) (base_coach.py:48,
    # hyperparameters.py:2) so the 0.06 early stop keeps its calibration.
    lp = make_lpips(lpips_type, vgg_params=vgg_params, vgg_head=lpips_head,
                    alex_params=alex_params, alex_head=alex_head,
                    key=jax.random.PRNGKey(seed))
    locality = None
    if use_locality_reg:
        # BASELINE config 4 / hyperparameters.py:9
        # use_locality_regularization — per-image camera is threaded by the
        # coach at loss time.
        from tgi.losses.locality import SpaceRegularizer
        locality = SpaceRegularizer(G, gen_params, lp, camera=None)
    coach = PTICoach(G, lp, CoachConfig(max_pti_steps=max_pti_steps,
                                        remat=batch > 1),
                     locality_regularizer=locality)
    tb = None
    if tensorboard:
        from tgi.utils.opt_viz import TBWriter
        tb = TBWriter(os.path.join(out_dir, "tb"))
    if use_wandb:
        # base_coach.py:107-115 / log_utils.py:9-21 hooks (offline mode
        # by default; see WandbWriter).
        from tgi.utils.opt_viz import FanoutWriter, WandbWriter
        wb = WandbWriter(project="tgi-pti",
                         config=dict(first_inv_steps=first_inv_steps,
                                     max_pti_steps=max_pti_steps,
                                     camera_mode=camera_mode))
        tb = wb if tb is None else FanoutWriter([tb, wb])

    results = []
    key = jax.random.PRNGKey(seed)

    def pivot_files(name):
        return (os.path.join(out_dir, f"{name}_ws.npy"),
                os.path.join(out_dir, f"{name}_cam.npy"))

    def emit_outputs(name, img, ws, cam, tuned, info, t0):
        """Per-image artifacts after both stages (single_id_coach.py
        :57-62, 80-116): grids, orbit videos, tuned ckpt, mesh, metrics."""
        pivot_out = G.synthesis(gen_params, ws, cam, det=True)
        if save_pivot:
            save_image_grid(os.path.join(out_dir, f"{name}_pivot.png"),
                            np.concatenate([np.asarray(img),
                                            np.asarray(pivot_out["image"])]))
        if gen_video:
            # Pivot-stage orbit BEFORE tuning (single_id_coach.py:57-62).
            from tgi.apps.gen_videos import gen_interp_video
            gen_interp_video(G, gen_params, ws,
                             os.path.join(out_dir, f"{name}_pivot.mp4"),
                             num_frames=60, batch=4)

        final_out = G.synthesis(tuned, ws, cam, det=True)
        save_image_grid(os.path.join(out_dir, f"{name}.png"),
                        np.concatenate([np.asarray(img),
                                        np.asarray(final_out["image"])]))
        from tgi.io import save_checkpoint
        save_checkpoint(os.path.join(out_dir, f"{name}_G.ckpt"), tuned,
                        config=G.cfg)

        if gen_video:
            from tgi.apps.gen_videos import gen_interp_video
            gen_interp_video(G, tuned, ws,
                             os.path.join(out_dir, f"{name}.mp4"),
                             num_frames=60, batch=4)
        if gen_mesh:
            from tgi.apps.shape import extract_mesh
            extract_mesh(G, tuned, ws, resolution=256,
                         out_ply=os.path.join(out_dir, f"{name}.ply"))

        entry = {"image": name, "pti_steps": int(info["steps"]),
                 "final_lpips": float(info["final_lpips"]),
                 "sec": round(time.time() - t0, 2)}
        if tb is not None:
            tb.scalars({k: v for k, v in entry.items() if k != "image"},
                       len(results), prefix=f"{name}/")
            tb.flush()
        if do_evaluation:
            entry.update(evaluate_reconstruction(
                final_out["image"], jnp.asarray(img), lp, arcface_params))
            with open(os.path.join(out_dir, f"{name}metrics.txt"),
                      "w") as f:
                json.dump(entry, f, indent=1)
        results.append(entry)

    if batch > 1:
        if visualize_opt:
            raise ValueError("--visualize-opt needs per-image snapshot "
                             "callbacks; run with batch=1")
        _run_batched(list_images(image_dir), out_dir, batch=batch, G=G,
                     gen_params=gen_params, proj=proj, coach=coach, tb=tb,
                     key=key, use_last_w_pivots=use_last_w_pivots,
                     pivot_files=pivot_files, emit_outputs=emit_outputs)
    else:
        for path in list_images(image_dir):
            name = os.path.splitext(os.path.basename(path))[0]
            t0 = time.time()
            key, k_proj, k_tune = jax.random.split(key, 3)

            img = load_image(path, size=G.cfg.img_resolution)   # [-1,1]
            target_255 = jnp.asarray(
                (load_image(path, size=256) + 1) * 127.5)

            # Stage 1 (or reload saved pivots — base_coach.py:69-77's
            # use_last_w_pivots resume path).
            ws_file, cam_file = pivot_files(name)
            if use_last_w_pivots and os.path.exists(ws_file) \
                    and os.path.exists(cam_file):
                ws = jnp.asarray(np.load(ws_file))
                cam = jnp.asarray(np.load(cam_file))
            else:
                snapshot_fn = None
                if visualize_opt:
                    from tgi.utils.opt_viz import make_projection_snapshotter
                    snapshot_fn = make_projection_snapshotter(
                        proj, out_dir, name, tb=tb)
                ws, cam, state, metrics = proj.project(
                    k_proj, target_255, snapshot_fn=snapshot_fn,
                    target_full=img)
                if tb is not None:
                    losses = np.asarray(metrics["loss"])
                    for s, v in enumerate(losses):
                        tb.scalar(f"{name}/projection_loss", v, s)
                np.save(ws_file, np.asarray(ws))
                np.save(cam_file, np.asarray(cam))

            # Stage 2.
            tuned, info = coach.tune(k_tune, gen_params, ws, cam,
                                     jnp.asarray(img))
            emit_outputs(name, img, ws, cam, tuned, info, t0)
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    return results


def _run_batched(paths, out_dir, *, batch, G, gen_params, proj, coach, tb,
                 key, use_last_w_pivots, pivot_files, emit_outputs):
    """Chunked batched inversion: ``batch`` images at a time through
    Projector.project_batch (stage 1) + PTICoach.tune_batch (stage 2),
    then the standard per-image artifact pass. A chunk reuses saved
    pivots only when EVERY image in it has them (a partial chunk would
    change the batch shape and force a recompile per combination)."""
    from tgi.utils.image import load_image

    for lo in range(0, len(paths), batch):
        chunk = paths[lo:lo + batch]
        names = [os.path.splitext(os.path.basename(p))[0] for p in chunk]
        t0 = time.time()
        key, k_proj, k_tune = jax.random.split(key, 3)

        imgs = [load_image(p, size=G.cfg.img_resolution) for p in chunk]
        t255s = jnp.stack([jnp.asarray((load_image(p, size=256) + 1)
                                       * 127.5) for p in chunk])

        files = [pivot_files(n) for n in names]
        if use_last_w_pivots and all(os.path.exists(f) for pair in files
                                     for f in pair):
            ws_b = jnp.stack([jnp.asarray(np.load(wf)) for wf, _ in files])
            cams_b = jnp.stack([jnp.asarray(np.load(cf))
                                for _, cf in files])
        else:
            ws_b, cams_b, _state, metrics = proj.project_batch(
                k_proj, t255s,
                targets_warp=jnp.stack([jnp.asarray(i) for i in imgs]))
            if tb is not None:
                losses = np.asarray(metrics["loss"])   # [steps, B]
                for b, name in enumerate(names):
                    for s in range(losses.shape[0]):
                        tb.scalar(f"{name}/projection_loss",
                                  losses[s, b], s)
            for b, (wf, cf) in enumerate(files):
                np.save(wf, np.asarray(ws_b[b]))
                np.save(cf, np.asarray(cams_b[b]))

        tuned_b, info_b = coach.tune_batch(
            k_tune, gen_params, ws_b, cams_b,
            jnp.stack([jnp.asarray(i) for i in imgs]))
        stage_share = (time.time() - t0) / len(names)
        for b, name in enumerate(names):
            tuned = jax.tree_util.tree_map(lambda x: x[b], tuned_b)
            info = {k: v[b] for k, v in info_b.items()}
            # Per-image `sec` = amortized share of the batched stages
            # plus this image's own artifact time.
            emit_outputs(name, imgs[b], ws_b[b], cams_b[b], tuned, info,
                         time.time() - stage_share)


def evaluate_reconstruction(gen_img, real_img, lpips_loss, arcface_params):
    """Per-image MSE / LPIPS / MS-SSIM / ID (single_id_coach.py:87-106)."""
    from tgi.metrics import ms_ssim
    out = {
        "mse": float(jnp.mean(jnp.square(gen_img - real_img))),
        "lpips": float(lpips_loss.from_unit(gen_img, real_img).sum()),
        "ms_ssim": float(ms_ssim((gen_img + 1) / 2,
                                 (real_img + 1) / 2).mean()),
    }
    if arcface_params is not None:
        from tgi.losses.id_loss import id_loss
        from tgi.models.arcface import arcface_apply
        out["id_similarity"] = 1.0 - float(id_loss(
            lambda x: arcface_apply(arcface_params, x), gen_img, real_img))
    return out


@click.command()
@click.option("--network", required=True, help=".pkl / .ckpt generator")
@click.option("--images", "image_dir", required=True)
@click.option("--outdir", "out_dir", required=True)
@click.option("--pose-weights", default=None, help="pose_estimator .pt")
@click.option("--e4e-weights", default=None)
@click.option("--vgg-weights", default=None)
@click.option("--arcface-weights", default=None)
@click.option("--lpips-weights", default=None,
              help="lpips-package LPIPS(net='alex') state dict .pt")
@click.option("--lpips-type", default="alex",
              type=click.Choice(["alex", "vgg"]),
              help="stage-2 tuning loss backbone (hyperparameters.py:2)")
@click.option("--use-locality-reg/--no-locality-reg", default=False,
              help="Space_Regulizer during tuning (hyperparameters.py:9)")
@click.option("--allow-random-init", is_flag=True, default=False,
              help="permit random init when weight files are absent "
                   "(smoke tests only — outputs are garbage)")
@click.option("--camera-mode", default="quat",
              type=click.Choice(["2d", "quat", "6d"]))
@click.option("--first-inv-steps", default=400)
@click.option("--max-pti-steps", default=400)
@click.option("--batch", default=1,
              help="invert N images simultaneously (project_batch + "
                   "tune_batch; per-image semantics preserved, amortized "
                   "wall-clock)")
@click.option("--use-last-w-pivots/--no-use-last-w-pivots", default=False,
              help="reload saved (ws, cam) pivots instead of re-running "
                   "stage 1 (hyperparameters.use_last_w_pivots, "
                   "base_coach.py:69-77)")
@click.option("--video/--no-video", "gen_video", default=True)
@click.option("--mesh/--no-mesh", "gen_mesh", default=False)
@click.option("--eval/--no-eval", "do_evaluation", default=False)
@click.option("--visualize-opt/--no-visualize-opt", default=False,
              help="dump reconstruction + warp PNGs every 10 projection "
                   "steps (w_projector.py:193-212)")
@click.option("--tensorboard/--no-tensorboard", default=False,
              help="mirror metrics/images to <outdir>/tb (log_utils.py)")
@click.option("--wandb/--no-wandb", "use_wandb", default=False,
              help="mirror metrics/images to wandb (offline mode; "
                   "base_coach.py:107-115 hooks)")
def main(network, image_dir, out_dir, pose_weights, e4e_weights, vgg_weights,
         arcface_weights, lpips_weights, lpips_type, use_locality_reg,
         allow_random_init, camera_mode, first_inv_steps, max_pti_steps,
         batch, use_last_w_pivots, gen_video, gen_mesh, do_evaluation,
         visualize_opt, tensorboard, use_wandb):
    from tgi.models.alexnet import (alex_head_init, alexnet_init,
                                    convert_lpips_alex)
    from tgi.models.pose_resnet import (convert_torch_state_dict,
                                        resnet34_init)
    from tgi.models.vgg import (convert_lpips_head, convert_torch_features,
                                lpips_head_init, vgg16_init)

    def require(path, flag):
        """A typo'd or absent weight file must fail loudly, not silently
        random-init into garbage reconstructions."""
        if path and not os.path.exists(path):
            raise click.ClickException(f"{flag}: file not found: {path}")
        if not path and not allow_random_init:
            raise click.ClickException(
                f"{flag} is required (or pass --allow-random-init for a "
                "smoke run with random weights)")
        return bool(path)

    G, gen_params = load_any_generator(network)
    key = jax.random.PRNGKey(0)

    from tgi.io.validate import expected_spec, validate_tree

    dims = {"2d": 2, "quat": 4, "6d": 6}[camera_mode]
    if require(pose_weights, "--pose-weights"):
        pose_params = validate_tree(
            convert_torch_state_dict(load_torch_state_dict(pose_weights)),
            expected_spec(resnet34_init, key, output_dims=dims),
            "pose estimator")
    else:
        click.echo("WARNING: random-init pose estimator (no --pose-weights)")
        pose_params = resnet34_init(key, output_dims=dims)

    if require(vgg_weights, "--vgg-weights"):
        sd = load_torch_state_dict(vgg_weights)
        vgg_params = validate_tree(convert_torch_features(sd),
                                   expected_spec(vgg16_init, key), "vgg16")
        head = convert_lpips_head(sd)
        lpips_head = validate_tree(
            head, expected_spec(lpips_head_init, key),
            "lpips-vgg head") if head else lpips_head_init(key)
    else:
        click.echo("WARNING: random-init VGG/LPIPS (no --vgg-weights)")
        vgg_params = vgg16_init(key)
        lpips_head = lpips_head_init(key)

    alex_params = alex_head = None
    if lpips_type == "alex":
        if require(lpips_weights, "--lpips-weights"):
            alex_params, alex_head = convert_lpips_alex(
                load_torch_state_dict(lpips_weights))
            validate_tree(alex_params, expected_spec(alexnet_init, key),
                          "alexnet trunk")
            validate_tree(alex_head, expected_spec(alex_head_init, key),
                          "lpips-alex head")
        else:
            click.echo("WARNING: random-init alex-LPIPS "
                       "(no --lpips-weights)")
            alex_params = alexnet_init(key)
            alex_head = alex_head_init(key)

    e4e_params = e4e_latent_avg = None
    if e4e_weights:
        import torch

        from tgi.models.e4e import convert_psp_checkpoint
        # Raw load (not load_torch_state_dict): convert_psp_checkpoint
        # needs the full ckpt to pick up 'latent_avg' next to
        # 'state_dict' (psp.py:31-40) and handles prefix stripping +
        # structural validation itself.
        ckpt = torch.load(e4e_weights, map_location="cpu",
                          weights_only=False)
        if hasattr(ckpt, "state_dict"):
            ckpt = ckpt.state_dict()
        e4e_params, e4e_latent_avg = convert_psp_checkpoint(ckpt)

    arc = None
    if arcface_weights:
        from tgi.models.arcface import arcface_init
        from tgi.models.arcface import convert_torch_state_dict as conv_arc
        arc = validate_tree(
            conv_arc(load_torch_state_dict(arcface_weights)),
            expected_spec(arcface_init, key), "arcface")

    run_pti(image_dir, out_dir, G=G, gen_params=gen_params,
            pose_params=pose_params, vgg_params=vgg_params,
            lpips_head=lpips_head, e4e_params=e4e_params,
            e4e_latent_avg=e4e_latent_avg,
            arcface_params=arc, alex_params=alex_params,
            alex_head=alex_head, lpips_type=lpips_type,
            use_locality_reg=use_locality_reg, camera_mode=camera_mode,
            first_inv_steps=first_inv_steps, max_pti_steps=max_pti_steps,
            gen_video=gen_video, gen_mesh=gen_mesh,
            do_evaluation=do_evaluation, visualize_opt=visualize_opt,
            tensorboard=tensorboard, use_wandb=use_wandb, batch=batch,
            use_last_w_pivots=use_last_w_pivots)


if __name__ == "__main__":
    main()
