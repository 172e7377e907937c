"""GAN metric evaluation CLI.

Behavioral parity target: calc_metrics.py:31-190. Single-program SPMD
replaces the per-GPU subprocess spawn + NCCL rendezvous: batches shard
over the mesh 'data' axis and the host loop is identical on every
process.
"""

from __future__ import annotations

import click
import numpy as np

import jax
import jax.numpy as jnp


def default_camera_sampler(G, pivot=(0, 0, 0.2), radius=2.7, fov=18.837,
                           yaw_std=0.35, pitch_std=0.15):
    from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                    pack_camera)
    intr = fov_to_intrinsics(fov)

    def sample(key, n):
        ky, kp = jax.random.split(key)
        yaw = np.pi / 2 + jax.random.normal(ky, (n,)) * yaw_std
        pitch = np.pi / 2 + jax.random.normal(kp, (n,)) * pitch_std
        cams = look_at_pose(yaw, pitch, jnp.asarray(pivot), radius=radius)
        return pack_camera(cams, intr)

    return sample


def load_detector_feature_fn(path):
    """Detector weights file -> fn(img_unit [-1,1] NCHW) -> [N, 2048].

    Accepts either the reference's NVIDIA Inception-2015-12-05 detector
    pickle (metric_utils.py:44-57; TF graph names, loaded code-free) or
    a torchvision ``inception_v3`` state_dict — FID/KID/PR numbers with
    the NVIDIA weights are directly comparable to upstream-published
    values.
    """
    from tgi.metrics.inception import (convert_nvidia_inception,
                                       convert_torch_inception,
                                       inception_feature_fn,
                                       nvidia_detector_fn)
    if path.endswith(".pkl"):
        from tgi.io.pickle_import import ReferenceUnpickler
        with open(path, "rb") as f:
            obj = ReferenceUnpickler(f).load()
        nv_fn = nvidia_detector_fn(convert_nvidia_inception(obj))
        return lambda img_unit: nv_fn((img_unit + 1) * 127.5)
    from tgi.apps.run_pti import load_torch_state_dict
    sd = load_torch_state_dict(path)
    if any(k.startswith(("layers.", "output.")) for k in sd):
        nv_fn = nvidia_detector_fn(convert_nvidia_inception(sd))
        return lambda img_unit: nv_fn((img_unit + 1) * 127.5)
    return inception_feature_fn(convert_torch_inception(sd))


@click.command()
@click.option("--network", required=True)
@click.option("--data", required=True, help="dataset dir or zip")
@click.option("--metrics", default="fid,kid", help="comma-separated")
@click.option("--num-items", default=1000)
@click.option("--run-dir", default=None)
@click.option("--detector", default=None,
              help="Inception detector weights: NVIDIA detector .pkl "
                   "(reference metric_utils.py:44-57) or torchvision "
                   "inception_v3 state_dict")
@click.option("--vgg-weights", default=None,
              help="fallback VGG16 feature detector (non-comparable "
                   "to upstream FID; use --detector for parity)")
def main(network, data, metrics, num_items, run_dir, detector,
         vgg_weights):
    from tgi.apps.run_pti import load_any_generator, load_torch_state_dict
    from tgi.metrics.features import (compute_dataset_features,
                                      compute_generator_features)
    from tgi.metrics.gan_metrics import calc_metric, report_metric
    from tgi.models.vgg import (convert_torch_features, lpips_features,
                                lpips_head_init, vgg16_init)
    from tgi.train.dataset import ImageFolderDataset

    G, params = load_any_generator(network)
    key = jax.random.PRNGKey(0)
    if detector:
        feature_fn = load_detector_feature_fn(detector)
    else:
        if vgg_weights:
            vgg = convert_torch_features(
                load_torch_state_dict(vgg_weights))
        else:
            click.echo("WARNING: random-init VGG detector "
                       "(no --detector / --vgg-weights)")
            vgg = vgg16_init(key)
        head = lpips_head_init(key)

        def feature_fn(img_unit):
            return lpips_features(vgg, head, (img_unit + 1) * 127.5)

    dataset = ImageFolderDataset(data, resolution=G.cfg.img_resolution)
    real = compute_dataset_features(dataset, jax.jit(feature_fn),
                                    max_items=num_items,
                                    cache_dir=run_dir)
    gen = compute_generator_features(
        G, params, feature_fn, default_camera_sampler(G),
        num_items=num_items)

    for metric in metrics.split(","):
        result = calc_metric(metric.strip(), real_stats=real,
                             gen_stats=gen, G=G, params=params)
        report_metric(result, run_dir=run_dir, snapshot=network)


if __name__ == "__main__":
    main()
