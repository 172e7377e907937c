"""EG3D GAN training CLI.

Counterpart of the reference's (unshipped) train.py launcher driving
training/training_loop.py: dataset zip + camera labels -> pjit'd GAN
training over the device mesh.
"""

from __future__ import annotations

import click

import jax


@click.command()
@click.option("--data", required=True, help="dataset dir or zip")
@click.option("--outdir", required=True)
@click.option("--batch", "batch_size", default=4)
@click.option("--gamma", "r1_gamma", default=1.0)
@click.option("--total-kimg", default=25000)
@click.option("--img-resolution", default=512)
@click.option("--neural-res", default=64)
@click.option("--sr-module", default="SuperresolutionHybrid8XDC")
@click.option("--gpc-reg-prob", default=0.5)
@click.option("--density-reg", default=0.25)
@click.option("--resume", "resume_ckpt", default=None)
@click.option("--mesh-data", default=None, type=int,
              help="data-parallel axis size (default: all devices)")
def main(data, outdir, batch_size, r1_gamma, total_kimg, img_resolution,
         neural_res, sr_module, gpc_reg_prob, density_reg, resume_ckpt,
         mesh_data):
    from tgi.models import TriPlaneGenerator, GeneratorConfig, \
        default_rendering_kwargs
    from tgi.nn.discriminator import DiscriminatorConfig
    from tgi.parallel import make_mesh
    from tgi.train.gan import GANTrainConfig
    from tgi.train.loop import training_loop

    rk = default_rendering_kwargs(
        image_resolution=img_resolution,
        superresolution_module=sr_module,
        density_reg=density_reg)
    G = TriPlaneGenerator(GeneratorConfig(
        img_resolution=img_resolution, rendering_kwargs=rk,
        neural_rendering_resolution=neural_res, fused_dtype="bfloat16"))
    d_cfg = DiscriminatorConfig(c_dim=25, img_resolution=img_resolution,
                                img_channels=6)
    cfg = GANTrainConfig(batch_size=batch_size, r1_gamma=r1_gamma,
                         gpc_reg_prob=gpc_reg_prob)
    mesh = None
    if len(jax.devices()) > 1:
        mesh = make_mesh(data=mesh_data)
    training_loop(G=G, d_cfg=d_cfg, data_path=data, run_dir=outdir,
                  cfg=cfg, total_kimg=total_kimg, mesh=mesh,
                  resume_ckpt=resume_ckpt)


if __name__ == "__main__":
    main()
