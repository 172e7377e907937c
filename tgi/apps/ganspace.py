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

# Curated directions (run_ganspace.py:71-79, verbatim values):
# (idx_comp, start_layer, layer_num, edit_power). The component indices
# index the SHIPPED precomputed bases (ganspace/pca_comp/*.npy, rows =
# unit-norm PCs) — load them with :func:`load_components`; against a
# self-computed PCA they are meaningless.
DIRECTIONS = {
    "bright hair": dict(comp=2, layers=(7, 14), strength=4),
    "smile": dict(comp=12, layers=(0, 5), strength=2),
    "age": dict(comp=5, layers=(0, 5), strength=3.5),      # negative: young
    "short hair": dict(comp=2, layers=(0, 5), strength=4),  # negative
    "glass": dict(comp=4, layers=(0, 5), strength=4),       # negative
    "gender": dict(comp=0, layers=(0, 5), strength=4),      # neg: f -> m
}


def load_components(path, w_dim=512):
    """Load a reference precomputed PCA basis (ganspace/pca_comp/*.npy).

    The shipped files are [K, w_dim] float32 with rows = unit-norm
    principal components in decreasing-variance order — the layout
    :func:`compute_pca` also returns and :func:`edit_ws` consumes
    (run_ganspace.py:66 loads the file; :28 transposes to [w_dim, K]
    columns, then picks column ``idx_comp`` — i.e. row ``idx_comp``
    here). Validates shape and row normalization so a transposed or
    truncated basis fails loudly.
    """
    comps = np.load(path)
    if comps.ndim != 2 or comps.shape[1] != w_dim:
        raise ValueError(f"PCA components {path}: expected [K, {w_dim}], "
                         f"got {comps.shape}")
    norms = np.linalg.norm(comps, axis=1)
    if not np.allclose(norms, 1.0, atol=1e-3):
        raise ValueError(
            f"PCA components {path}: rows are not unit-norm "
            f"(min {norms.min():.4f}, max {norms.max():.4f}) — "
            "transposed basis?")
    return np.asarray(comps, np.float32)


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


def edit_sweep(G, params, ws, camera, components, *, comp_idx,
               layers=(0, 12), edit_power=1.0, num_imgs=5, outdir=None,
               name="sweep"):
    """Render ``num_imgs`` edits with control linearly swept from
    ``-edit_power`` to ``+edit_power`` (run_ganspace.py:30-52's grid).

    Returns (images [num_imgs, 3, H, W], directions [num_imgs, num_ws,
    w_dim]) — the per-image additive direction matrices the reference
    also returns.
    """
    ws = jnp.asarray(ws)
    powers = (np.linspace(-edit_power, edit_power, num_imgs)
              if num_imgs > 1 else np.asarray([edit_power]))
    imgs, dirs = [], []
    synth = jax.jit(lambda w: G.synthesis(params, w, camera,
                                          det=True)["image"])
    for p in powers:
        edited = edit_ws(ws, components, comp_idx, float(p), layers)
        imgs.append(synth(edited)[0])
        dirs.append(np.asarray(edited - ws)[0])
    imgs = jnp.stack(imgs)
    if outdir:
        from tgi.utils.image import save_image_grid
        os.makedirs(outdir, exist_ok=True)
        save_image_grid(os.path.join(outdir, f"{name}_grid.png"),
                        np.asarray(imgs))
    return imgs, np.stack(dirs)


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
