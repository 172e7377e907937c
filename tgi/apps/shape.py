"""3D shape extraction from the generator's density field.

Behavioral parity target: single_id_coach.py:120-163 / gen_samples.py
shape export: evaluate sigma on a voxel grid in chunks, then marching
cubes -> .ply / .mrc. TPU-first: the chunk loop is a ``lax.map`` over a
pre-reshaped [num_chunks, chunk, 3] grid — one compile, no host sync per
chunk — and the point axis is shardable over the mesh 'rays' axis
(SURVEY.md section 5.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tgi.utils.marching import marching_tetrahedra, save_mrc, save_ply


def sigma_grid(G, params, ws, resolution: int = 512, chunk: int = 1 << 20,
               shape_scale: float | None = None, planes=None):
    """Evaluate sigma on a resolution³ grid. Returns [R, R, R] numpy.

    The cube spans box_warp * shape_scale (reference samples the full
    rendering box).
    """
    rk = G.cfg.rendering_kwargs
    side = rk["box_warp"] * (shape_scale or 1.0)
    half = side / 2
    lin = np.linspace(-half, half, resolution, dtype=np.float32)
    pts = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"),
                   axis=-1).reshape(-1, 3)

    if planes is None:
        planes = G.backbone_planes(params, ws)
    planes = planes.astype(jnp.float32)

    n = pts.shape[0]
    chunk = min(chunk, n)
    pad = (-n) % chunk
    pts_padded = np.pad(pts, ((0, pad), (0, 0)))
    chunks = jnp.asarray(pts_padded.reshape(-1, chunk, 3))

    def eval_chunk(coords):
        from tgi.render.renderer import run_model
        out = run_model(planes, params["decoder"], coords[None], rk)
        return out["sigma"][0, :, 0]

    sigmas = jax.lax.map(eval_chunk, chunks)
    sigmas = np.asarray(sigmas).reshape(-1)[:n]
    return sigmas.reshape(resolution, resolution, resolution)


def sigma_cross_section(G, params, ws, *, axis: str = "y", offset: float = 0.0,
                        resolution: int = 256, shape_scale: float | None = None):
    """sigma sampled on an axis-aligned plane for visualization
    (training/crosssection_utils.py:13-24). Returns [R, R] numpy."""
    rk = G.cfg.rendering_kwargs
    side = rk["box_warp"] * (shape_scale or 1.0)
    half = side / 2
    lin = np.linspace(-half, half, resolution, dtype=np.float32)
    u, v = np.meshgrid(lin, lin, indexing="ij")
    o = np.full_like(u, offset)
    planes_xyz = {"x": (o, u, v), "y": (u, o, v), "z": (u, v, o)}[axis]
    pts = np.stack(planes_xyz, axis=-1).reshape(1, -1, 3)
    out = G.sample_mixed(params, jnp.asarray(pts), ws)
    return np.asarray(out["sigma"]).reshape(resolution, resolution)


def extract_mesh(G, params, ws, resolution: int = 256, level: float = 10.0,
                 out_ply: str | None = None, out_mrc: str | None = None,
                 **kw):
    """sigma grid -> marching tetrahedra -> optional .ply/.mrc export."""
    grid = sigma_grid(G, params, ws, resolution=resolution, **kw)
    if out_mrc:
        save_mrc(out_mrc, grid)
    verts, faces = marching_tetrahedra(grid, level=level,
                                       spacing=1.0 / resolution)
    if out_ply:
        save_ply(out_ply, verts, faces)
    return verts, faces
