"""VMEM-resident gather kernel bench (TPU) — round-3 item #1.

Compares the forward tri-plane gather formulations at the flagship shape
(G=3 planes, P=196608 points = 64x64 rays x 48 samples, 256^2 plane,
footprint-expanded [H*W, 128]):

  A. XLA take_along_axis, fp32 (current production fwd)
  B. XLA take_along_axis, bf16
  C. Pallas row-loop kernel, fp32
  D. Pallas row-loop kernel, bf16 (fp32-bitcast trick)
  E. Pallas MXU one-hot tile-walk, bf16, block-local order (+unperm)
  F. Pallas MXU one-hot tile-walk, bf16, raw ray-major order
  G. E at fp32

Coords are realistic ray geometry (pinhole frustum marching), NOT uniform
random — spatial locality sets the MXU variant's pass count.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tgi.ops.grid_sample import _point_indices
from tgi.ops.pallas.splat_pack import (TILE, _tiled_cell, reorder_perm_shape)
from tgi.ops.pallas.gather_vmem import (gather_rows_vmem,
                                        gather_rows_vmem_bf16,
                                        gather_rows_mxu)

G, C, H, W = 3, 32, 256, 256
Ry = Rx = 64
S = 48
P = Ry * Rx * S
point_layout = (Ry, Rx, S)


def ray_coords():
    """Plausible frustum-march coords in [-1, 1], ray-major [Ry*Rx*S]."""
    u, v = np.meshgrid(np.linspace(-1, 1, Rx), np.linspace(-1, 1, Ry))
    d = np.stack([u * 0.35, v * 0.35, np.ones_like(u)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.array([0.15, -0.1, -2.7])
    t = np.linspace(2.2, 3.2, S)
    pts = o + t[None, None, :, None] * d[:, :, None, :]   # [Ry, Rx, S, 3]
    pts = pts.reshape(P, 3) * 2.0                          # box_warp-ish
    # three plane projections (x,y), (x,z), (z,x)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    proj = np.stack([np.stack([x, y], -1), np.stack([x, z], -1),
                     np.stack([z, x], -1)])                # [3, P, 2]
    return jnp.asarray(np.clip(proj, -1.05, 1.05), jnp.float32)


coords = ray_coords()
key = jax.random.PRNGKey(0)
exp32 = jax.random.normal(key, (G, H * W, 128), jnp.float32)
exp16 = exp32.astype(jnp.bfloat16)

x0, y0, _, _ = _point_indices(coords, H, W)
y0c = jnp.clip(y0, 0, H - 1)
x0c = jnp.clip(x0, 0, W - 1)
cells = y0c * W + x0c                                      # row-major
cells_tiled = _tiled_cell(y0c, x0c, W)                     # tile-ordered

dims, axes = reorder_perm_shape(P, point_layout)
perm = np.arange(P).reshape(dims).transpose(axes).reshape(P)
inv_perm_np = np.argsort(perm)
cells_tiled_blocked = cells_tiled[:, jnp.asarray(perm)]


def untile_plane(e):
    """row-major [G, HW, L] -> 16x16 tile-ordered row numbering."""
    L = e.shape[-1]
    t = e.reshape(G, H // TILE, TILE, W // TILE, TILE, L)
    return jnp.transpose(t, (0, 1, 3, 2, 4, 5)).reshape(G, H * W, L)


exp32_t = jax.jit(untile_plane)(exp32)
exp16_t = jax.jit(untile_plane)(exp16)


def unperm(out):
    """Static inverse permutation: transpose back to ray-major."""
    L = out.shape[-1]
    r = out.reshape((G,) + tuple(dims[a] for a in axes) + (L,))
    inv = tuple(np.argsort(axes))
    return jnp.transpose(r, (0,) + tuple(a + 1 for a in inv) + (6,)
                         ).reshape(G, P, L)


def chain(fn, *args, n=8, warmup=2):
    @jax.jit
    def run(s, *a):
        def body(c, _):
            return c + fn(c, *a), None
        out, _ = jax.lax.scan(body, s, None, length=n)
        return out
    for _ in range(warmup):
        float(run(jnp.float32(0), *args))
    t0 = time.perf_counter()
    float(run(jnp.float32(0), *args))
    return (time.perf_counter() - t0) / n


def report(name, sec):
    print(f"{name:56s} {sec * 1e3:8.2f} ms", flush=True)


def v_xla(s, e, cl):
    f = jnp.take_along_axis(e + s.astype(e.dtype), cl[..., None], axis=1)
    return jnp.sum(f.astype(jnp.float32)) * 1e-9


def v_loop(s, e, cl):
    f = gather_rows_vmem(e + s.astype(e.dtype), cl)
    return jnp.sum(f.astype(jnp.float32)) * 1e-9


def v_loop16(s, e, cl):
    f = gather_rows_vmem_bf16(e + s.astype(e.dtype), cl)
    return jnp.sum(f.astype(jnp.float32)) * 1e-9


def v_mxu(s, e, cl, do_unperm):
    f = gather_rows_mxu(e + s.astype(e.dtype), cl)
    if do_unperm:
        f = unperm(f)
    return jnp.sum(f.astype(jnp.float32)) * 1e-9


print("backend:", jax.default_backend(), flush=True)

# correctness first (vs XLA fp32 gather)
ref = jax.jit(lambda: jnp.take_along_axis(exp32, cells[..., None], axis=1))()
got_loop = jax.jit(lambda: gather_rows_vmem(exp32, cells))()
print("loop fp32 max|d|:", float(jnp.max(jnp.abs(ref - got_loop))))
ref16 = jax.jit(lambda: jnp.take_along_axis(
    exp16, cells[..., None], axis=1))().astype(jnp.float32)
got_l16 = jax.jit(lambda: gather_rows_vmem_bf16(exp16, cells))()
print("loop bf16 max|d| vs bf16 ref:",
      float(jnp.max(jnp.abs(ref16 - got_l16.astype(jnp.float32)))))
got_mxu = jax.jit(lambda: unperm(
    gather_rows_mxu(exp16_t, cells_tiled_blocked)))()
print("mxu bf16 max|d| vs bf16 ref:",
      float(jnp.max(jnp.abs(ref16 - got_mxu.astype(jnp.float32)))))
got_mxu32 = jax.jit(lambda: unperm(
    gather_rows_mxu(exp32_t, cells_tiled_blocked)))()
print("mxu fp32 max|d|:", float(jnp.max(jnp.abs(ref - got_mxu32))))

report("A xla take_along_axis fp32", chain(v_xla, exp32, cells))
report("B xla take_along_axis bf16", chain(v_xla, exp16, cells))
report("C pallas row-loop fp32", chain(v_loop, exp32, cells))
report("D pallas row-loop bf16 (bitcast)", chain(v_loop16, exp16, cells))
report("E pallas mxu bf16 blocked+unperm",
       chain(lambda s, e, cl: v_mxu(s, e, cl, True),
             exp16_t, cells_tiled_blocked))
report("F pallas mxu bf16 ray-major (no reorder)",
       chain(lambda s, e, cl: v_mxu(s, e, cl, False),
             exp16_t, cells_tiled))
report("G pallas mxu fp32 blocked+unperm",
       chain(lambda s, e, cl: v_mxu(s, e, cl, True),
             exp32_t, cells_tiled_blocked))
