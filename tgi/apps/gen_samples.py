"""Sample images (and optional shapes) from a generator checkpoint.

Behavioral parity target: gen_samples.py (seeds -> images at angle
offsets + optional 512³ shape export).
"""

from __future__ import annotations

import os

import click
import numpy as np

import jax
import jax.numpy as jnp

from tgi.render.cameras import (fov_to_intrinsics, look_at_pose, pack_camera)
from tgi.utils.image import save_image


def generate_samples(G, params, seeds, *, outdir, truncation_psi=0.7,
                     truncation_cutoff=14, angles=((0.0, 0.0),),
                     fov=18.837, radius=2.7, pivot=(0, 0, 0.2),
                     shapes=False, shape_res=256):
    """Render each seed at the given (yaw_offset, pitch_offset) angles."""
    os.makedirs(outdir, exist_ok=True)
    intr = fov_to_intrinsics(fov)
    cond_cam = pack_camera(
        look_at_pose(np.pi / 2, np.pi / 2, jnp.asarray(pivot),
                     radius=radius)[None], intr)

    @jax.jit
    def render(params, z, c):
        ws = G.mapping(params, z, cond_cam,
                       truncation_psi=truncation_psi,
                       truncation_cutoff=truncation_cutoff)
        return G.synthesis(params, ws, c, det=True)["image"], ws

    paths = []
    for seed in seeds:
        z = jax.random.normal(jax.random.PRNGKey(seed), (1, G.cfg.z_dim))
        for ai, (dy, dp) in enumerate(angles):
            cam = look_at_pose(np.pi / 2 + dy, np.pi / 2 + dp,
                               jnp.asarray(pivot), radius=radius)
            c = pack_camera(cam[None], intr)
            img, ws = render(params, z, c)
            path = os.path.join(outdir, f"seed{seed:04d}_a{ai}.png")
            save_image(path, np.asarray(img))
            paths.append(path)
        if shapes:
            from tgi.apps.shape import extract_mesh
            extract_mesh(G, params, ws, resolution=shape_res,
                         out_ply=os.path.join(outdir, f"seed{seed:04d}.ply"))
    return paths


@click.command()
@click.option("--network", "network_pkl", required=True,
              help="Reference .pkl or tgi checkpoint")
@click.option("--seeds", default="0-3", help="e.g. 0,1,5-10")
@click.option("--outdir", required=True)
@click.option("--trunc", "truncation_psi", default=0.7)
@click.option("--shapes", is_flag=True)
@click.option("--shape-res", default=256)
def main(network_pkl, seeds, outdir, truncation_psi, shapes, shape_res):
    from tgi.apps.run_pti import load_any_generator, parse_range
    G, params = load_any_generator(network_pkl)
    generate_samples(G, params, parse_range(seeds), outdir=outdir,
                     truncation_psi=truncation_psi, shapes=shapes,
                     shape_res=shape_res,
                     angles=((0.35, 0), (0, 0), (-0.35, 0)))


if __name__ == "__main__":
    main()
