"""Gather-formulation microbench for the triplane forward (TPU).

Variants at the flagship shape (G=3 operands, P=196608 points,
256^2 x 32ch planes):
  A. current: two [*, 2, C] row-pair gathers (top + bottom)
  B. expanded: ONE [*, 128] flat fetch from the 4C footprint-expanded
     plane [H*W, 128] (expansion built on the fly, counted in the time)
  C. expanded, bf16 operand
  D. B but with the expansion precomputed (steady-state cost)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain(fn, *args, n=8, warmup=1):
    @jax.jit
    def run(s, *a):
        out, _ = jax.lax.scan(lambda c, _: (fn(c, *a), None), s, None,
                              length=n)
        return out
    for _ in range(warmup):
        float(run(jnp.float32(0), *args))
    t0 = time.perf_counter()
    float(run(jnp.float32(0), *args))
    return (time.perf_counter() - t0) / n


def report(name, sec):
    print(f"{name:48s} {sec * 1e3:8.2f} ms")


G, P, C, H, W = 3, 196608, 32, 256, 256
key = jax.random.PRNGKey(0)
img = jax.random.normal(key, (G, C, H, W))
coords = jax.random.uniform(key, (G, P, 2)) * 2.2 - 1.1

from tgi.ops.grid_sample import (_gather_row_pair, _point_indices,
                                 _combine_pairs)


def variant_a(s, img, coords):
    x0, y0, _, _ = _point_indices(coords + s * 0, H, W)
    nhwc = jnp.transpose(img + s, (0, 2, 3, 1))
    tp = _gather_row_pair(nhwc, y0, x0, H, W)
    bp = _gather_row_pair(nhwc, y0 + 1, x0, H, W)
    out = _combine_pairs(tp, bp, coords, (H, W), img.dtype)
    return jnp.mean(out) * 1e-6


def expand(img):
    """[G, C, H, W] -> [G, H*W, 4C] footprint-expanded (NHWC corners)."""
    nhwc = jnp.transpose(img, (0, 2, 3, 1))                # [G, H, W, C]
    right = jnp.pad(nhwc[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    down = jnp.pad(nhwc[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    dr = jnp.pad(nhwc[:, 1:, 1:], ((0, 0), (0, 1), (0, 1), (0, 0)))
    e = jnp.concatenate([nhwc, right, down, dr], axis=-1)  # [G, H, W, 4C]
    return e.reshape(G, H * W, 4 * C)


def gather_expanded(e, coords, dtype):
    x0, y0, wx, wy = _point_indices(coords, H, W)
    y0c = jnp.clip(y0, 0, H - 1)
    x0c = jnp.clip(x0, 0, W - 1)
    cell = y0c * W + x0c
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    f = jax.lax.gather(e, cell[..., None], dn, slice_sizes=(1, 1, 4 * C),
                       mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    f = f.astype(jnp.float32)
    # corner weights with OOB masks and clip-slot remap (cheap selects;
    # exactness vs variant A checked below)
    wxs = wx[..., 0]
    wys = wy[..., 0]
    w4 = jnp.stack([(1 - wxs) * (1 - wys), wxs * (1 - wys),
                    (1 - wxs) * wys, wxs * wys], axis=-1)
    # validity per corner
    from tgi.ops.pallas.splat_pack import pack_footprint
    _, w4s = pack_footprint(y0, x0, w4, H, W)
    out = jnp.einsum("gpkc,gpk->gpc", f.reshape(G, P, 4, C), w4s)
    return out.astype(dtype)


def variant_b(s, img, coords):
    e = expand(img + s)
    out = gather_expanded(e, coords, img.dtype)
    return jnp.float32(jnp.mean(out.astype(jnp.float32)) * 1e-6)


def variant_d(s, e, coords):
    out = gather_expanded(e + s, coords, jnp.float32)
    return jnp.mean(out) * 1e-6


print("backend:", jax.default_backend())
report("A row-pair gathers (current fwd)", chain(variant_a, img, coords))
report("B expanded flat fetch (incl. expansion)",
       chain(variant_b, img, coords))
imgb = img.astype(jnp.bfloat16)
report("C expanded flat fetch bf16", chain(lambda s, i, c: variant_b(s.astype(jnp.bfloat16), i, c), imgb, coords))
e = jax.block_until_ready(jax.jit(expand)(img))
report("D expanded flat fetch (pre-expanded)", chain(variant_d, e, coords))

# correctness vs A
a = jax.jit(lambda: _combine_pairs(
    _gather_row_pair(jnp.transpose(img, (0, 2, 3, 1)),
                     _point_indices(coords, H, W)[1],
                     _point_indices(coords, H, W)[0], H, W),
    _gather_row_pair(jnp.transpose(img, (0, 2, 3, 1)),
                     _point_indices(coords, H, W)[1] + 1,
                     _point_indices(coords, H, W)[0], H, W),
    coords, (H, W), img.dtype))()
b = jax.jit(lambda: gather_expanded(expand(img), coords, img.dtype))()
print("max diff A vs B:", float(jnp.max(jnp.abs(a - b))))
