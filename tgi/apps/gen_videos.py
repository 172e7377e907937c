"""Novel-view orbit videos from inverted or sampled latents.

Behavioral parity target: gen_videos.py:74-311 (gen_interp_video): cubic
w-interpolation over keyframes, sinusoidal yaw ±0.35 / pitch ±0.25 orbit,
240 frames. TPU-first: frames are rendered in BATCHES through one jitted
batched synthesis call instead of one host-dispatched render per frame —
the camera loop is data, not control flow.

Video encoding uses imageio+ffmpeg when present and falls back to GIF
(this image has no ffmpeg).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tgi.render.cameras import (fov_to_intrinsics, look_at_pose, pack_camera)
from tgi.utils.image import to_uint8


def orbit_cameras(num_frames: int, pivot, radius=2.7, fov=18.837,
                  yaw_range=0.35, pitch_range=0.25):
    """The reference's sinusoidal orbit (gen_videos.py:107-114)."""
    t = np.arange(num_frames, dtype=np.float32) / num_frames
    yaw = np.pi / 2 + yaw_range * np.sin(2 * np.pi * t)
    pitch = np.pi / 2 - 0.05 + pitch_range * np.cos(2 * np.pi * t)
    cams = look_at_pose(jnp.asarray(yaw), jnp.asarray(pitch),
                        jnp.asarray(pivot), radius=radius)
    return pack_camera(cams, fov_to_intrinsics(fov))


def interp_ws(ws_keyframes: np.ndarray, num_frames: int,
              w_frames_per_key: int = 240) -> np.ndarray:
    """Cubic interpolation over w keyframes (gen_videos.py:86-95).
    ws_keyframes: [K, num_ws, D] -> [num_frames, num_ws, D]."""
    from scipy.interpolate import CubicSpline
    K = ws_keyframes.shape[0]
    if K == 1:
        return np.repeat(ws_keyframes, num_frames, axis=0)
    x = np.arange(-1, K + 2)
    wrapped = np.concatenate([ws_keyframes[-1:], ws_keyframes,
                              ws_keyframes[:2]], axis=0)
    spline = CubicSpline(x, wrapped, axis=0)
    t = np.linspace(0, K - 1, num_frames)
    return spline(t).astype(np.float32)


def export_frame_shape(G, params, w, out_ply, resolution=128, level=10.0):
    """Per-frame shape export (gen_videos.py:139-177): sigma grid with
    the reference's border zeroing and axis flip, then a .ply at
    level=10 via marching tetrahedra."""
    from tgi.apps.shape import sigma_grid
    from tgi.utils.marching import marching_tetrahedra, save_ply

    grid = sigma_grid(G, params, w, resolution=resolution)
    grid = np.flip(np.asarray(grid), 0).copy()
    pad = int(30 * resolution / 256)
    pad_top = int(38 * resolution / 256)
    if pad:
        grid[:pad] = 0
        grid[-pad:] = 0
        grid[:, :pad] = 0
        grid[:, :, :pad] = 0
        grid[:, :, -pad:] = 0
    if pad_top:
        grid[:, -pad_top:] = 0
    verts, faces = marching_tetrahedra(grid, level=level,
                                       spacing=1.0 / resolution)
    save_ply(out_ply, verts, faces)
    return out_ply


def render_orbit(G, params, ws, *, num_frames=240, batch=8, radius=2.7,
                 pivot=(0, 0, 0.2), sample_mult=2, key=None,
                 shapes_dir=None, shape_res=128):
    """Render the orbit; returns uint8 frames [T, H, W, 3].

    sample_mult scales depth sampling as gen_videos.py:288-289 does.
    shapes_dir: when set, also export '<frame:04d>_shape.ply' per frame
    (gen_videos.py:139-177's gen_shapes path).
    """
    rk = G.cfg.rendering_kwargs
    G = type(G)(G.cfg.with_rendering(
        depth_resolution=int(rk["depth_resolution"] * sample_mult),
        depth_resolution_importance=int(
            rk["depth_resolution_importance"] * sample_mult)))

    cams = orbit_cameras(num_frames, pivot, radius=radius)
    ws = jnp.asarray(ws)
    if ws.ndim == 2:
        ws = ws[None]
    if ws.shape[0] == 1:
        ws_frames = jnp.tile(ws, (num_frames, 1, 1))
    else:
        ws_frames = jnp.asarray(interp_ws(np.asarray(ws), num_frames))

    @jax.jit
    def render_batch(params, ws_b, c_b):
        return G.synthesis(params, ws_b, c_b, det=True)["image"]

    frames = []
    pad = (-num_frames) % batch
    ws_frames = jnp.concatenate(
        [ws_frames, ws_frames[:1].repeat(pad, axis=0)]) if pad else ws_frames
    cams = jnp.concatenate([cams, cams[:1].repeat(pad, axis=0)]) if pad \
        else cams
    for i in range(0, num_frames + pad, batch):
        imgs = render_batch(params, ws_frames[i:i + batch],
                            cams[i:i + batch])
        frames.extend(to_uint8(np.asarray(imgs[j]))
                      for j in range(imgs.shape[0]))
    if shapes_dir is not None:
        import os
        os.makedirs(shapes_dir, exist_ok=True)
        for f in range(num_frames):
            export_frame_shape(
                G, params, ws_frames[f:f + 1],
                os.path.join(shapes_dir, f"{f:04d}_shape.ply"),
                resolution=shape_res)
    return np.stack(frames[:num_frames])


def write_video(path: str, frames: np.ndarray, fps: int = 60):
    """mp4 via imageio/ffmpeg if available, else GIF fallback."""
    import imageio
    try:
        imageio.mimwrite(path, list(frames), fps=fps)
        return path
    except Exception:
        gif = path.rsplit(".", 1)[0] + ".gif"
        imageio.mimwrite(gif, list(frames), duration=1000 / fps, loop=0)
        return gif


def gen_interp_video(G, params, ws, out_path, **kw):
    """End-to-end equivalent of gen_videos.gen_interp_video."""
    frames = render_orbit(G, params, ws, **kw)
    return write_video(out_path, frames)


def main():
    """CLI equivalent of the reference gen_videos.py click command
    (gen_videos.py:221-238): seeds or saved w pivots -> orbit video."""
    import click

    @click.command()
    @click.option("--network", required=True)
    @click.option("--seeds", default=None, help="e.g. 0,1,5-10")
    @click.option("--ws", "ws_path", default=None, help="saved _ws.npy")
    @click.option("--output", required=True)
    @click.option("--frames", default=240)
    @click.option("--sample-mult", default=2)
    @click.option("--trunc", default=0.7)
    @click.option("--shapes/--no-shapes", default=False,
                  help="per-frame .ply export (gen_videos.py:139-177)")
    @click.option("--shape-res", default=128)
    def cli(network, seeds, ws_path, output, frames, sample_mult, trunc,
            shapes, shape_res):
        import jax
        from tgi.apps.run_pti import load_any_generator, parse_range
        from tgi.render.cameras import (fov_to_intrinsics, look_at_pose,
                                        pack_camera)
        G, params = load_any_generator(network)
        if ws_path:
            ws = jnp.asarray(np.load(ws_path))
        else:
            assert seeds is not None, "need --seeds or --ws"
            cond = pack_camera(
                look_at_pose(np.pi / 2, np.pi / 2,
                             jnp.asarray([0., 0., 0.2]), 2.7)[None],
                fov_to_intrinsics(18.837))
            zs = jnp.stack([jax.random.normal(jax.random.PRNGKey(s),
                                              (G.cfg.z_dim,))
                            for s in parse_range(seeds)])
            ws = G.mapping(params, zs, jnp.tile(cond, (zs.shape[0], 1)),
                           truncation_psi=trunc, truncation_cutoff=14)
        import os
        out = gen_interp_video(
            G, params, ws, output, num_frames=frames,
            sample_mult=sample_mult,
            shapes_dir=(os.path.splitext(output)[0] + "_shapes"
                        if shapes else None),
            shape_res=shape_res)
        click.echo(f"wrote {out}")

    cli()


if __name__ == "__main__":
    main()
