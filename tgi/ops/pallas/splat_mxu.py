"""Pallas TPU kernel: bilinear splat as sorted one-hot MXU segment-sums.

The gather's transpose (d_plane[y, x, c] += w * g[c] over ~800k corner
contributions per plane) is the render-backward hot spot. The v1 kernel
(tgi.ops.pallas.splat) streams point RMWs serially — ~10 cycles per
row-update bounds it at ~35 ms per plane. This kernel restructures the
scatter so the accumulation happens on the MXU:

  1. XLA prep: expand each point into its 4 corner contributions
     (cell = y*W + x, weighted grad row w*g), and SORT them by cell — one
     batched argsort plus gathers, all TPU-fast ops.
  2. Kernel: the gradient plane lives in VMEM as packed rows
     [H*W/per, 128] with ``per = 128 // C`` cells per 128-lane row (flat
     order == the [H, W, C] reshape). For each block of B sorted entries:
     pack each wg row into its lane slot ``(cell % per) * C`` (VPU
     selects), build the window one-hot ``oh[r, e] = (cell_e // per ==
     base + r)``, and accumulate ``acc[base:base+RW] += oh @ G4`` — one
     [RW, B] x [B, 128] MXU matmul. Sorted order makes most blocks span
     << RW packed rows; a while-loop walks extra windows for the rare
     block that spans more, so the kernel is correct for ANY entry order
     and merely fastest for sorted input.

MEASURED OUTCOME (v5e, G=3, P=196k): 130+ ms — 4x WORSE than the
serialized-RMW v1 kernel (32 ms). The prep dominates: jnp.argsort is
8-11 ms nearly independent of size (pass-count bound) and the sorted
payload gather [786k, 32] another ~7 ms. Kept as a reference design and
selectable via TGI_SPLAT=mxu; the production kernel is
tgi.ops.pallas.splat_pack (sort-free footprint packing, ~12 ms
in-context). See PERF.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ENTRY_BLOCK = 512      # entries per grid step
WINDOW_ROWS = 64       # packed accumulator rows per one-hot window


def _make_kernel(per, C):
    def kernel(first_smem, rows_ref, slot_ref, wg_ref, out_hbm, acc, sem):
        """Grid (G, n_blocks): rows [1,B] packed-row per entry; slot [B,1]
        lane-slot per entry; wg [B,C] weighted grads."""
        nrows = acc.shape[0]

        @pl.when(pl.program_id(1) == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        rows = rows_ref[0, 0]                    # [1, B] int32
        slot = slot_ref[0]                       # [B, 1] int32
        wg = wg_ref[0]                           # [B, C] fp32
        B = wg.shape[0]
        # Lane packing: G4[e, s*C + c] = wg[e, c] * (slot_e == s).
        g4 = jnp.concatenate(
            [wg * (slot == s).astype(wg.dtype) for s in range(per)],
            axis=1)                              # [B, per*C = 128]
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (WINDOW_ROWS, B), 0)

        def pass_body(carry):
            base, _ = carry
            oh = (rows - base == r_iota).astype(jnp.float32)
            delta = jnp.dot(oh, g4, preferred_element_type=jnp.float32)
            acc[pl.ds(base, WINDOW_ROWS), :] += delta
            beyond = jnp.where(rows >= base + WINDOW_ROWS, rows, 2 ** 30)
            nxt = jnp.min(beyond)
            nxt_base = jnp.minimum((nxt // 8) * 8,
                                   jnp.int32(nrows - WINDOW_ROWS))
            return nxt_base, nxt < 2 ** 30

        first = jnp.minimum((first_smem[0, 0, 0, 0] // 8) * 8,
                            jnp.int32(nrows - WINDOW_ROWS))
        jax.lax.while_loop(lambda c: c[1], pass_body, (first, True))

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            dma = pltpu.make_async_copy(acc, out_hbm.at[pl.program_id(0)],
                                        sem)
            dma.start()
            dma.wait()

    return kernel


@functools.lru_cache(maxsize=None)
def _mxu_for(H, W):
    """Batching-safe wrapper (vmapped batched inversion): a leading batch
    axis folds naturally into the plane axis G — same kernel, bigger grid
    — so the batched call IS the flat call on reshaped inputs."""
    @jax.custom_batching.custom_vmap
    def fn(y0, x0, w4, grads):
        return _plane_splat_mxu_impl(y0, x0, w4, grads, H=H, W=W)

    @fn.def_vmap
    def _vmap_rule(axis_size, in_batched, y0, x0, w4, grads):
        assert all(in_batched), "all splat operands carry the batch axis"
        B, G, P = y0.shape
        C = grads.shape[-1]
        out = _mxu_for(H, W)(y0.reshape(B * G, P), x0.reshape(B * G, P),
                             w4.reshape(B * G, P, 4),
                             grads.reshape(B * G, P, C))
        return out.reshape(B, G, H, W, C), True

    return fn


def plane_splat_mxu(y0, x0, w4, grads, *, H, W):
    return _mxu_for(H, W)(y0, x0, w4, grads)


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _plane_splat_mxu_impl(y0, x0, w4, grads, *, H, W):
    """Accumulate bilinear corner contributions into [G, H, W, C].

    Args:
        y0, x0: [G, P] int32 floor indices (UNclamped: -1 / H-1 at borders
            is fine — out-of-bounds corners must carry zero weight in w4).
        w4: [G, P, 4] corner weights in order (tl, tr, bl, br), zeroed for
            out-of-bounds corners.
        grads: [G, P, C] fp32 incoming gradients.

    Returns [G, H, W, C] fp32 gradient planes.
    """
    G, P = y0.shape
    C = grads.shape[-1]
    per = 128 // C
    assert 128 % C == 0 and per >= 1, C
    E = 4 * P
    nrows = (H * W) // per
    assert (H * W) % per == 0 and nrows % 8 == 0

    # Corner cells; invalid corners keep zero weight and a clamped cell.
    ys = jnp.stack([y0, y0, y0 + 1, y0 + 1], axis=-1)      # [G, P, 4]
    xs = jnp.stack([x0, x0 + 1, x0, x0 + 1], axis=-1)
    valid = (ys >= 0) & (ys < H) & (xs >= 0) & (xs < W)
    w4 = jnp.where(valid, w4.astype(jnp.float32), 0.0)
    cell = (jnp.clip(ys, 0, H - 1) * W
            + jnp.clip(xs, 0, W - 1)).reshape(G, E)
    w_flat = w4.reshape(G, E)

    order = jnp.argsort(cell, axis=-1)
    cell_s = jnp.take_along_axis(cell, order, axis=-1)
    w_s = jnp.take_along_axis(w_flat, order, axis=-1)
    g_s = jnp.take_along_axis(grads.astype(jnp.float32), (order // 4)[..., None],
                              axis=1)
    wg = g_s * w_s[..., None]                              # [G, E, C]

    pad = (-E) % ENTRY_BLOCK
    if pad:
        cell_s = jnp.pad(cell_s, ((0, 0), (0, pad)),
                         constant_values=H * W - 1)
        wg = jnp.pad(wg, ((0, 0), (0, pad), (0, 0)))
    Epad = cell_s.shape[1]
    nb = Epad // ENTRY_BLOCK

    rows = (cell_s // per).reshape(G, nb, 1, ENTRY_BLOCK)
    slot_c = ((cell_s % per) * 1).reshape(G, Epad, 1)      # [G, E, 1]
    first = rows[:, :, 0, 0].reshape(G, nb, 1, 1)
    wg = wg.reshape(G, Epad, C)

    out = pl.pallas_call(
        _make_kernel(per, C),
        grid=(G, nb),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, ENTRY_BLOCK), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ENTRY_BLOCK, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ENTRY_BLOCK, C), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((G, nrows, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nrows, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(first, rows, slot_c, wg)
    return out.reshape(G, H, W, C)
