"""GANSpace: PCA directions in w-space + semantic editing.

Behavioral parity targets: ganspace/pca_anlaysis.py:10-33 (1e5 w samples
under a fixed front camera -> PCA -> saved components) and
ganspace/run_ganspace.py:22-79 (w + V·control over chosen layers ->
synthesis grid; curated direction dict). PCA runs as a single jitted
eigendecomposition of the w covariance — no sklearn.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from tgi.render.cameras import (fov_to_intrinsics, look_at_pose, pack_camera)

# Curated directions (component index, layer range, strength) mirroring
# run_ganspace.py:71-79.
DIRECTIONS = {
    "smile": dict(comp=22, layers=(3, 6), strength=-24),
    "age": dict(comp=17, layers=(3, 7), strength=-18),
    "glasses": dict(comp=11, layers=(0, 4), strength=16),
    "gender": dict(comp=1, layers=(0, 5), strength=-9),
}


def compute_pca(G, params, *, num_samples=100_000, batch=4096, key=None,
                pivot=(0, 0, 0.2), radius=2.7, fov=18.837):
    """PCA of mapped w under the canonical front camera.

    Returns (components [D, D] rows = PCs by decreasing variance,
    stdevs [D], mean [D]).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    cam = pack_camera(
        look_at_pose(np.pi / 2, np.pi / 2, jnp.asarray(pivot),
                     radius=radius)[None], fov_to_intrinsics(fov))

    @jax.jit
    def map_batch(k):
        z = jax.random.normal(k, (batch, G.cfg.z_dim))
        ws = G.mapping(params, z, jnp.tile(cam, (batch, 1)))
        return ws[:, 0, :]

    n_batches = (num_samples + batch - 1) // batch
    moments1 = jnp.zeros((G.cfg.w_dim,))
    moments2 = jnp.zeros((G.cfg.w_dim, G.cfg.w_dim))
    n = 0
    for i in range(n_batches):
        w = map_batch(jax.random.fold_in(key, i))
        moments1 = moments1 + w.sum(0)
        moments2 = moments2 + w.T @ w
        n += w.shape[0]
    mean = moments1 / n
    cov = moments2 / n - jnp.outer(mean, mean)
    eigvals, eigvecs = jnp.linalg.eigh(cov)
    order = jnp.argsort(-eigvals)
    comps = eigvecs[:, order].T
    stdev = jnp.sqrt(jnp.maximum(eigvals[order], 0))
    return np.asarray(comps), np.asarray(stdev), np.asarray(mean)


def edit_ws(ws, components, comp_idx, strength, layers):
    """Apply a PCA direction to layer range [lo, hi) of a w+ code
    (run_ganspace.py:22-58)."""
    lo, hi = layers
    direction = jnp.asarray(components[comp_idx])
    ws = jnp.asarray(ws)
    edited = ws.at[:, lo:hi, :].add(strength * direction)
    return edited


def edit_and_render(G, params, ws, camera, components, *, direction=None,
                    comp_idx=None, strength=0.0, layers=(0, 14),
                    outdir=None, name="edit"):
    """Render original vs edited; returns (orig, edited) images."""
    if direction is not None:
        spec = DIRECTIONS[direction]
        comp_idx, layers = spec["comp"], spec["layers"]
        strength = strength or spec["strength"]
    edited_ws = edit_ws(ws, components, comp_idx, strength, layers)
    orig = G.synthesis(params, jnp.asarray(ws), camera, det=True)["image"]
    edit = G.synthesis(params, edited_ws, camera, det=True)["image"]
    if outdir:
        from tgi.utils.image import save_image_grid
        os.makedirs(outdir, exist_ok=True)
        save_image_grid(os.path.join(outdir, f"{name}.png"),
                        np.concatenate([np.asarray(orig), np.asarray(edit)]))
    return orig, edit
