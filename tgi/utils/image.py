"""Image IO helpers (PIL-based; replaces the reference's scattered
PIL.Image.fromarray call sites, e.g. single_id_coach.py:57-62)."""

from __future__ import annotations

import numpy as np
from PIL import Image


def to_uint8(img, input_range=(-1, 1)):
    """[C, H, W] or [N, C, H, W] float -> [H, W, C] uint8 (first item)."""
    arr = np.asarray(img)
    if arr.ndim == 4:
        arr = arr[0]
    lo, hi = input_range
    arr = (arr - lo) / (hi - lo) * 255.0
    arr = np.clip(np.rint(arr), 0, 255).astype(np.uint8)
    return np.transpose(arr, (1, 2, 0))


def save_image(path, img, input_range=(-1, 1)):
    Image.fromarray(to_uint8(img, input_range), "RGB").save(path)


def save_image_grid(path, imgs, cols=None, input_range=(-1, 1)):
    """imgs: [N, C, H, W] -> single grid png."""
    arr = np.asarray(imgs)
    n = arr.shape[0]
    cols = cols or n
    rows = (n + cols - 1) // cols
    tiles = [to_uint8(arr[i], input_range) for i in range(n)]
    h, w, c = tiles[0].shape
    grid = np.zeros((rows * h, cols * w, c), np.uint8)
    for i, t in enumerate(tiles):
        r, col = divmod(i, cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = t
    Image.fromarray(grid, "RGB").save(path)


def load_image(path, size=None, to_range=(-1, 1)):
    """Load RGB image -> [1, 3, H, W] float32 in ``to_range``."""
    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize((size, size), Image.LANCZOS)
    arr = np.asarray(img, np.float32) / 255.0
    lo, hi = to_range
    arr = arr * (hi - lo) + lo
    return np.transpose(arr, (2, 0, 1))[None]
