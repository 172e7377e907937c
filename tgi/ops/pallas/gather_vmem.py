"""Pallas TPU kernels: VMEM-resident footprint gather (tri-plane forward).

The tri-plane forward gather through XLA's gather engine costs
~12 µs/1k fetches (8.6 ms per render pass on the footprint-expanded
layout). These kernels keep the footprint-expanded plane [H*W, 128]
resident in VMEM (17 MB bf16 / 34 MB fp32) and stream point blocks.

Two formulations:

* ``gather_rows_vmem`` — one 128-lane row read per point. Reads have no
  dependency chain (unlike the splat RMWs) so Mosaic pipelines them, but
  the issue rate (1 row/instruction) bounds throughput. Mosaic rejects
  single-row dynamic reads of bf16 blocks; ``gather_rows_vmem_bf16``
  works around it by bitcasting the bf16 plane to an fp32 [H*W, 64] view
  (pure reinterpretation — a row read moves the same 256 bytes).

* ``gather_rows_mxu`` — the splat_pack design run in reverse: with
  points ordered into spatially local blocks (the renderer's
  (Ry, Rx, S) ray-layout hint), a 512-point block touches only a
  handful of 256-row windows of the 16x16-cell-tiled plane, and each
  window's contribution is ONE one-hot MXU matmul
  ``onehot(rows)[B, 256] @ plane_window[256, 128]``. No dynamic row
  reads at all (windows are 256-row aligned slices), so bf16 planes
  work natively and the gather runs on the MXU instead of the gather
  engine.

Both return packed corner features f[p, 128] = (tl, tr, bl, br) x C; the
caller applies the bilinear weights (one [B, 4, C] x [B, 4] contraction
in XLA, which fuses).

Replaces the forward ``jnp.take_along_axis`` in
tgi.ops.grid_sample._gsp_tpu_for when TGI_GATHER selects it — the hot
path of reference renderer.py:64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

POINT_BLOCK = 512


def _kernel(cells_ref, plane_ref, out_ref):
    """Grid (G, nb). cells [1,1,1,B] int32 (SMEM); plane [1, HW, 128]
    (VMEM, cached across the point grid axis); out [1, B, 128]."""
    B = out_ref.shape[1]

    def body(e, _):
        c = cells_ref[0, 0, 0, e]
        out_ref[0, pl.ds(e, 1), :] = plane_ref[0, pl.ds(c, 1), :]
        return 0

    jax.lax.fori_loop(0, B, body, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_vmem(exp_planes, cells, interpret=False):
    """exp_planes: [G, HW, 128]; cells: [G, P] int32 clipped cell ids.

    Returns [G, P, 128] packed corner rows.
    """
    G, HW, L = exp_planes.shape
    P = cells.shape[1]
    assert L in (64, 128), L  # 64 = bf16-as-fp32 bitcast view
    pad = (-P) % POINT_BLOCK
    if pad:
        cells = jnp.pad(cells, ((0, 0), (0, pad)))
    Ppad = cells.shape[1]
    nb = Ppad // POINT_BLOCK
    cells_b = cells.reshape(G, nb, 1, POINT_BLOCK)

    out = pl.pallas_call(
        _kernel,
        grid=(G, nb),
        in_specs=[
            pl.BlockSpec((1, 1, 1, POINT_BLOCK), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, HW, L), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, POINT_BLOCK, L),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, Ppad, L), exp_planes.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cells_b, exp_planes)
    return out[:, :P]


def gather_rows_vmem_bf16(exp_planes, cells):
    """bf16 row gather via an fp32 bitcast view (Mosaic rejects bf16
    single-row dynamic reads; a [H*W, 64] fp32 reinterpretation moves the
    identical bytes). exp_planes: [G, HW, 128] bf16 -> [G, P, 128] bf16.
    """
    assert exp_planes.dtype == jnp.bfloat16
    G, HW, L = exp_planes.shape
    as_f32 = jax.lax.bitcast_convert_type(
        exp_planes.reshape(G, HW, L // 2, 2), jnp.float32)  # [G, HW, 64]
    out = gather_rows_vmem(as_f32, cells)                   # [G, P, 64]
    P = out.shape[1]
    back = jax.lax.bitcast_convert_type(out, jnp.bfloat16)  # [G, P, 64, 2]
    return back.reshape(G, P, L)


# ---------------------------------------------------------------------------
# MXU one-hot tile-walk gather (splat_pack run in reverse).

MXU_BLOCK = 512
TILE = 16
WINDOW = TILE * TILE      # 256 rows per 16x16-cell tile


def _mxu_kernel(first_smem, rows_ref, plane_ref, out_ref, acc):
    """Grid (G, nb). rows [1, 1, 1, B] tiled-cell row per point (VMEM);
    plane [1, HW, 128] (VMEM, cached across the point axis); out
    [1, B, 128]. Walks the touched 256-row windows; each pass is one
    [B, 256] x [256, 128] MXU matmul. Window membership masks make the
    result exact for ANY point order; ordering only sets the pass count.
    """
    nrows = plane_ref.shape[1]
    rows = rows_ref[0, 0]                        # [1, B] int32
    B = out_ref.shape[1]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, B), 0)
    acc[...] = jnp.zeros_like(acc)

    def pass_body(carry):
        undone, base = carry
        # one-hot is exact in bf16; plane payload rounds once (bf16 in,
        # fp32 accumulate) — same numerics as reading bf16 rows.
        oh = (rows - base == r_iota).astype(plane_ref.dtype)  # [WINDOW, B]
        win = plane_ref[0, pl.ds(pl.multiple_of(base, WINDOW), WINDOW), :]
        acc[...] += jax.lax.dot_general(
            oh, win, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        in_win = (undone >= base) & (undone < base + WINDOW)
        undone = jnp.where(in_win, 2 ** 30, undone)
        nxt = jnp.min(undone)
        nxt_base = jnp.minimum((nxt // WINDOW) * WINDOW,
                               jnp.int32(nrows - WINDOW))
        return (undone, nxt_base)

    def cond(carry):
        return jnp.min(carry[0]) < 2 ** 30

    first = jnp.minimum((first_smem[0, 0, 0, 0] // WINDOW) * WINDOW,
                        jnp.int32(nrows - WINDOW))
    jax.lax.while_loop(cond, pass_body, (rows, first))
    out_ref[0] = acc[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_mxu(exp_planes, cells_tiled, interpret=False):
    """exp_planes: [G, HW, 128] in 16x16 TILE-ORDERED row numbering
    (see splat_pack.untile_rows); cells_tiled: [G, P] int32 tiled-cell
    ids, ideally in spatially local block order. Returns [G, P, 128]
    packed corner rows (same dtype as the plane).
    """
    G, HW, L = exp_planes.shape
    P = cells_tiled.shape[1]
    assert L == 128
    pad = (-P) % MXU_BLOCK
    if pad:
        cells_tiled = jnp.pad(cells_tiled, ((0, 0), (0, pad)))
    Ppad = cells_tiled.shape[1]
    nb = Ppad // MXU_BLOCK
    rows = cells_tiled.reshape(G, nb, 1, MXU_BLOCK)
    first = rows[:, :, 0, 0].reshape(G, nb, 1, 1)

    out = pl.pallas_call(
        _mxu_kernel,
        grid=(G, nb),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, MXU_BLOCK), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HW, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, MXU_BLOCK, 128), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, Ppad, 128), exp_planes.dtype),
        scratch_shapes=[pltpu.VMEM((MXU_BLOCK, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(first, rows, exp_planes)
    return out[:, :P]
