"""Is the splat kernel bound by the while-loop's scalar schedule chain?

A: production kernel (while_loop walks touched windows; each pass's base
   depends on the previous pass's masked min — a loop-carried scalar
   chain that serializes even the MXU work).
B: same math with a STATIC 9-pass unrolled schedule (wrong results —
   bases ignore the data — but identical instruction mix). If B runs
   much faster, a precomputed-neighborhood schedule is the next kernel.
C: static 16-pass neighborhood anchored at the block's min window —
   correct whenever the block fits a 4x4 window patch (the layout
   guarantees ~36x36 px + drift), plus residual while_loop for leftovers.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tgi.ops.pallas.splat_pack import (ENTRY_BLOCK, TILE, WINDOW,
                                       plane_splat_pack, pack_footprint,
                                       reorder_perm_shape)

Gp, C, H, W = 3, 32, 256, 256
Ry = Rx = 64
S = 48
P = Ry * Rx * S


def _kernel_static(first_smem, rows_ref, wg_ref, out_hbm, acc, sem):
    nrows = acc.shape[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    rows = rows_ref[0, 0]
    wg = wg_ref[0]
    B = wg.shape[0]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, B), 0)
    first = jnp.minimum((first_smem[0, 0, 0, 0] // WINDOW) * WINDOW,
                        jnp.int32(nrows - 9 * WINDOW))
    for k in range(9):
        base = pl.multiple_of(first + k * WINDOW, WINDOW)
        oh = (rows - base == r_iota).astype(jnp.bfloat16)
        delta = jnp.dot(oh, wg, preferred_element_type=jnp.float32)
        acc[pl.ds(base, WINDOW), :] += delta

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        dma = pltpu.make_async_copy(acc, out_hbm.at[pl.program_id(0)], sem)
        dma.start()
        dma.wait()


def _kernel_nbhd(first_smem, rows_ref, wg_ref, out_hbm, acc, sem):
    """C: 4x4 window neighborhood anchored at the block's (min wy, min wx)
    + residual while_loop."""
    nrows = acc.shape[0]
    WGRID = W // TILE

    @pl.when(pl.program_id(1) == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    rows = rows_ref[0, 0]
    wg = wg_ref[0]
    B = wg.shape[0]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, B), 0)
    wid = rows // WINDOW
    wy = wid // WGRID
    wx = wid % WGRID
    wy0 = jnp.minimum(jnp.min(wy), jnp.int32(WGRID - 4))
    wx0 = jnp.minimum(jnp.min(wx), jnp.int32(WGRID - 4))
    covered = (wy >= wy0) & (wy < wy0 + 4) & (wx >= wx0) & (wx < wx0 + 4)
    for ky in range(4):
        for kx in range(4):
            base = pl.multiple_of(
                ((wy0 + ky) * WGRID + (wx0 + kx)) * WINDOW, WINDOW)
            oh = (rows - base == r_iota).astype(jnp.bfloat16)
            delta = jnp.dot(oh, wg, preferred_element_type=jnp.float32)
            acc[pl.ds(base, WINDOW), :] += delta

    undone0 = jnp.where(covered, 2 ** 30, rows)

    def pass_body(carry):
        undone, base = carry
        oh = (rows - base == r_iota).astype(jnp.bfloat16)
        delta = jnp.dot(oh, wg, preferred_element_type=jnp.float32)
        acc[pl.ds(base, WINDOW), :] += delta
        in_win = (undone >= base) & (undone < base + WINDOW)
        undone = jnp.where(in_win, 2 ** 30, undone)
        nxt = jnp.min(undone)
        nxt_base = jnp.minimum((nxt // WINDOW) * WINDOW,
                               jnp.int32(nrows - WINDOW))
        return (undone, nxt_base)

    def cond(carry):
        return jnp.min(carry[0]) < 2 ** 30

    nxt = jnp.min(undone0)
    first = jnp.minimum((nxt // WINDOW) * WINDOW, jnp.int32(nrows - WINDOW))
    jax.lax.while_loop(cond, pass_body, (undone0, first))

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        dma = pltpu.make_async_copy(acc, out_hbm.at[pl.program_id(0)], sem)
        dma.start()
        dma.wait()


def run_kernel(kernel, cell, wg):
    G = cell.shape[0]
    Epad = cell.shape[1]
    nb = Epad // ENTRY_BLOCK
    rows = cell.reshape(G, nb, 1, ENTRY_BLOCK)
    first = rows[:, :, 0, 0].reshape(G, nb, 1, 1)
    return pl.pallas_call(
        kernel,
        grid=(G, nb),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, ENTRY_BLOCK), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ENTRY_BLOCK, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((G, H * W, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((H * W, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(first, rows, wg)


def ray_cells():
    """Realistic layout-ordered cells (frustum march, tiled+blocked)."""
    u, v = np.meshgrid(np.linspace(-1, 1, Rx), np.linspace(-1, 1, Ry))
    d = np.stack([u * 0.35, v * 0.35, np.ones_like(u)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.array([0.15, -0.1, -2.7])
    t = np.linspace(2.2, 3.2, S)
    pts = (o + t[None, None, :, None] * d[:, :, None, :]).reshape(P, 3) * 2
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    proj = np.stack([np.stack([x, y], -1), np.stack([x, z], -1),
                     np.stack([z, x], -1)])
    ix = np.clip((proj[..., 0] + 1) * (W / 2) - 0.5, 0, W - 2)
    iy = np.clip((proj[..., 1] + 1) * (H / 2) - 0.5, 0, H - 2)
    y0 = jnp.asarray(np.floor(iy), jnp.int32)
    x0 = jnp.asarray(np.floor(ix), jnp.int32)
    return y0, x0


y0, x0 = ray_cells()
key = jax.random.PRNGKey(0)
w4 = jax.random.uniform(key, (Gp, P, 4))
grads = jax.random.normal(key, (Gp, P, C))

cell, w4s = pack_footprint(y0, x0, w4.astype(jnp.float32), H, W)
wg = (w4s[..., :, None] * grads.astype(jnp.float32)[..., None, :]
      ).reshape(Gp, P, 128).astype(jnp.bfloat16)
dims, axes = reorder_perm_shape(P, (Ry, Rx, S))
perm = np.arange(P).reshape(dims).transpose(axes).reshape(P)
cell_b = cell[:, jnp.asarray(perm)]
wg_b = wg[:, jnp.asarray(perm)]


def chain(fn, *args, n=4):
    @jax.jit
    def run(s, *a):
        def body(c, _):
            return c + fn(c, *a), None
        out, _ = jax.lax.scan(body, s, None, length=n)
        return out
    float(run(jnp.float32(0), *args))
    t0 = time.perf_counter()
    float(run(jnp.float32(0), *args))
    return (time.perf_counter() - t0) / n


from tgi.ops.pallas.splat_pack import _kernel as _kernel_prod

print("A production while-loop kernel:",
      f"{chain(lambda s, c, w: jnp.mean(run_kernel(_kernel_prod, c, w + s.astype(jnp.bfloat16))) * 1e-6, cell_b, wg_b) * 1e3:.2f} ms")
print("B static 9-pass (timing only):",
      f"{chain(lambda s, c, w: jnp.mean(run_kernel(_kernel_static, c, w + s.astype(jnp.bfloat16))) * 1e-6, cell_b, wg_b) * 1e3:.2f} ms")
print("C 4x4 neighborhood + residual:",
      f"{chain(lambda s, c, w: jnp.mean(run_kernel(_kernel_nbhd, c, w + s.astype(jnp.bfloat16))) * 1e-6, cell_b, wg_b) * 1e3:.2f} ms")

# C correctness vs A
outA = jax.jit(lambda: run_kernel(_kernel_prod, cell_b, wg_b))()
outC = jax.jit(lambda: run_kernel(_kernel_nbhd, cell_b, wg_b))()
print("C max|d| vs A:", float(jnp.max(jnp.abs(outA - outC))))
