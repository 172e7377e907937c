"""Pallas TPU kernel: bilinear splat via footprint-packed one-hot MXU
matmuls over tiled cell windows (v3 — no sort, no payload gather).

Each point's 2x2 bilinear footprint is packed into ONE entry: a 128-lane
payload ``wg[e] = w4 ⊗ g`` (4 corner slots x C=32 channels) destined for
ONE expanded cell (the clipped top-left corner). The accumulator is the
"expanded plane" [H*W, 128] laid out in 16x16 CELL TILES (256 rows per
tile), so a spatially local block of points touches only a handful of
256-row windows. Per entry block the kernel walks the touched tiles:
``acc[tile] += onehot(rows)[256, B] @ wg[B, 128]`` — one MXU matmul per
(block, touched tile). The caller orders points [ray-tile, depth, ray]
(a static transpose) so a 512-entry block is one 8x8-ray tile over 8
depth slices — a ~35x35-cell footprint touching ~9 tiles.

The XLA epilogue un-tiles the accumulator and folds the 4 corner slots
back onto the plane with shifted adds (the transpose of footprint
expansion).

Correct for ANY point order (the tile walk masks by window membership);
ordering only controls the pass count. Replaces the serialized-RMW v1
kernel (~26 cycles per row update) with ~4 ms of MXU work per render
backward at the flagship shape.

Backward of tgi.ops.grid_sample.grid_sample_points on TPU — the hot path
of reference renderer.py:64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# Entries per kernel block. The kernel is bound by while-loop pass count
# (blocks x touched windows), not FLOPs: bigger blocks amortize more
# entries per touched window at the cost of a larger matmul per pass.
ENTRY_BLOCK = int(os.environ.get("TGI_SPLAT_BLOCK", "512"))
TILE = 16              # cells per tile side; window = TILE*TILE = 256 rows
WINDOW = TILE * TILE


def _kernel(first_smem, rows_ref, wg_ref, out_hbm, acc, sem):
    """Grid (G, n_blocks). rows [1, B] tiled-cell row per entry;
    wg [B, 128] packed payloads."""
    nrows = acc.shape[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    rows = rows_ref[0, 0]                        # [1, B] int32
    wg = wg_ref[0]                               # [B, 128] bf16
    B = wg.shape[0]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, B), 0)

    def pass_body(carry):
        undone, base = carry
        # bf16 x bf16 -> fp32 MXU: the one-hot is exact in bf16; wg loses
        # ~0.4% relative per contribution, accumulated in fp32 — gradient
        # noise well under bf16-training levels.
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

    first = jnp.minimum((first_smem[0, 0, 0, 0] // WINDOW) * WINDOW,
                        jnp.int32(nrows - WINDOW))
    jax.lax.while_loop(cond, pass_body, (rows, first))

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        dma = pltpu.make_async_copy(acc, out_hbm.at[pl.program_id(0)], sem)
        dma.start()
        dma.wait()


def _tiled_cell(y, x, W):
    """Row-major cell (y, x) -> tiled numbering (16x16 tiles)."""
    return (((y // TILE) * (W // TILE) + (x // TILE)) * WINDOW
            + (y % TILE) * TILE + (x % TILE))


def untile_rows(acc, H, W):
    """[G, H*W, 128] tile-ordered -> row-major cell order."""
    G = acc.shape[0]
    acc = acc.reshape(G, H // TILE, W // TILE, TILE, TILE, 128)
    acc = jnp.transpose(acc, (0, 1, 3, 2, 4, 5))
    return acc.reshape(G, H * W, 128)


def fold_expanded(d_exp, H, W, C):
    """Fold the 4 corner slots of the expanded cotangent back onto the
    plane: slot (dy, dx) of cell (y, x) is a contribution to plane cell
    (y+dy, x+dx). d_exp: [G, H*W, 128] row-major -> [G, H, W, C]."""
    G = d_exp.shape[0]
    e = d_exp.reshape(G, H, W, 2, 2, C)
    out = e[:, :, :, 0, 0]
    out = out + jnp.pad(e[:, :, :-1, 0, 1], ((0, 0), (0, 0), (1, 0), (0, 0)))
    out = out + jnp.pad(e[:, :-1, :, 1, 0], ((0, 0), (1, 0), (0, 0), (0, 0)))
    out = out + jnp.pad(e[:, :-1, :-1, 1, 1],
                        ((0, 0), (1, 0), (1, 0), (0, 0)))
    return out


def corner_slots(y0, x0, H, W):
    """Per-corner slot mapping relative to the CLIPPED anchor.

    Returns (y0c, x0c, slots [G, P, 4] int32 in 0..3, valid [G, P, 4]):
    corner k (tl, tr, bl, br order) of the true footprint lives at slot
    ``slots[..., k]`` of the expanded cell (y0c, x0c) when valid; only
    the y0 = -1 / x0 = -1 borders remap (clip shifts the anchor)."""
    y0c = jnp.clip(y0, 0, H - 1)
    x0c = jnp.clip(x0, 0, W - 1)
    dys = (0, 0, 1, 1)
    dxs = (0, 1, 0, 1)
    slots = []
    valids = []
    for k in range(4):
        ry = y0 + dys[k]
        rx = x0 + dxs[k]
        valids.append((ry >= 0) & (ry < H) & (rx >= 0) & (rx < W))
        sdy = jnp.clip(ry - y0c, 0, 1)
        sdx = jnp.clip(rx - x0c, 0, 1)
        slots.append(sdy * 2 + sdx)
    return (y0c, x0c, jnp.stack(slots, axis=-1),
            jnp.stack(valids, axis=-1))


def pack_footprint(y0, x0, w4, H, W):
    """Clip the footprint anchor into the plane and remap corner weights
    to their slots relative to the clipped anchor.

    Returns (cell_tiled [G, P], w4_slots [G, P, 4]) where slot order is
    (tl, tr, bl, br) relative to the CLIPPED anchor. Out-of-bounds
    corners carry zero weight; corners that fall on a different slot
    after clipping (only possible at the y=-1 / x=-1 borders) are moved.
    """
    y0c, x0c, slots, valid = corner_slots(y0, x0, H, W)
    w4 = jnp.where(valid, w4, 0.0)
    w_out = []
    for s in range(4):
        w_out.append(jnp.sum(jnp.where(slots == s, w4, 0.0), axis=-1))
    w4s = jnp.stack(w_out, axis=-1)
    return _tiled_cell(y0c, x0c, W), w4s


def reorder_perm_shape(P, point_layout):
    """(reshape dims, transpose axes) turning ray-major [Ry*Rx*S] point
    order into [tileY, tileX, S, 8, 8] block-local order, or None when
    the layout doesn't tile."""
    if point_layout is None:
        return None
    Ry, Rx, S = point_layout
    if Ry * Rx * S != P or Ry % 8 or Rx % 8:
        return None
    return (Ry // 8, 8, Rx // 8, 8, S), (0, 2, 4, 1, 3)


@functools.lru_cache(maxsize=None)
def _pack_for(H, W, point_layout):
    @jax.custom_batching.custom_vmap
    def fn(y0, x0, w4, grads):
        return _plane_splat_pack_impl(y0, x0, w4, grads, H=H, W=W,
                                      point_layout=point_layout)

    @fn.def_vmap
    def _vmap_rule(axis_size, in_batched, y0, x0, w4, grads):
        assert all(in_batched)
        B, G, P = y0.shape
        C = grads.shape[-1]
        out = _pack_for(H, W, point_layout)(
            y0.reshape(B * G, P), x0.reshape(B * G, P),
            w4.reshape(B * G, P, 4), grads.reshape(B * G, P, C))
        return out.reshape(B, G, H, W, C), True

    return fn


def plane_splat_pack(y0, x0, w4, grads, *, H, W, point_layout=None):
    """Accumulate bilinear corner contributions into [G, H, W, C].

    y0/x0: [G, P] unclipped floor indices; w4: [G, P, 4] corner weights
    (tl, tr, bl, br), zeroed out of bounds; grads: [G, P, C].
    point_layout: optional (Ry, Rx, S) ray-grid structure for spatial
    block ordering.
    """
    return _pack_for(H, W, point_layout)(y0, x0, w4, grads)


@functools.partial(jax.jit, static_argnames=("H", "W", "point_layout"))
def _plane_splat_pack_impl(y0, x0, w4, grads, *, H, W, point_layout):
    G, P = y0.shape
    C = grads.shape[-1]
    assert 4 * C == 128, C
    assert H % TILE == 0 and W % TILE == 0

    cell, w4s = pack_footprint(y0, x0, w4.astype(jnp.float32), H, W)
    wg = (w4s[..., :, None] * grads.astype(jnp.float32)[..., None, :]
          ).reshape(G, P, 128).astype(jnp.bfloat16)

    perm = reorder_perm_shape(P, point_layout)
    if perm is not None:
        dims, axes = perm
        cell = cell.reshape((G,) + dims).transpose(
            (0,) + tuple(a + 1 for a in axes)).reshape(G, P)
        wg = wg.reshape((G,) + dims + (128,)).transpose(
            (0,) + tuple(a + 1 for a in axes) + (6,)).reshape(G, P, 128)

    pad = (-P) % ENTRY_BLOCK
    if pad:
        cell = jnp.pad(cell, ((0, 0), (0, pad)),
                       constant_values=H * W - 1)
        wg = jnp.pad(wg, ((0, 0), (0, pad), (0, 0)))
    Epad = cell.shape[1]
    nb = Epad // ENTRY_BLOCK

    rows = cell.reshape(G, nb, 1, ENTRY_BLOCK)
    first = rows[:, :, 0, 0].reshape(G, nb, 1, 1)

    out = pl.pallas_call(
        _kernel,
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
    )(first, rows, wg.reshape(G, Epad, 128))
    d_exp = untile_rows(out, H, W)
    return fold_expanded(d_exp, H, W, C)
