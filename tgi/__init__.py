"""tgi — TPU-native 3D GAN inversion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
cvlab-kaist/3DGAN-Inversion (WACV 2023): EG3D tri-plane generation,
two-stage latent+pose inversion (projection + pivotal tuning), novel-view
rendering, shape extraction, GANSpace editing, pose-estimator training and
the inherited EG3D GAN training/metric stack — built TPU-first:

* the whole generator forward (mapping -> backbone -> volumetric render ->
  super-resolution) is one jittable function; hot loops run on device via
  ``lax.scan`` with no host round-trips;
* resampling ops are single XLA dilated convolutions instead of CUDA
  kernels; the tri-plane bilinear gather has a Pallas kernel;
* parallelism is expressed with ``jax.sharding`` meshes (data axis +
  ray/sample axis), not NCCL collectives.

Layout (see SURVEY.md section 7):
    tgi.ops       resampling / activation / grid-sample primitives
    tgi.nn        StyleGAN2 layers, mapping, synthesis, discriminator
    tgi.render    rays, ray marcher, importance sampling, tri-planes
    tgi.models    TriPlaneGenerator, pose ResNet, e4e, VGG/LPIPS, ArcFace
    tgi.losses    LPIPS, ID, warping, regularizers
    tgi.invert    w/pose projector + pivotal-tuning coach
    tgi.train     GAN training loop, losses, augmentation, datasets
    tgi.metrics   FID/KID/PR + feature stats
    tgi.io        reference-pickle import, orbax checkpoints
    tgi.parallel  device meshes and sharding rules
    tgi.apps      CLI entry points
"""

__version__ = "0.1.0"
