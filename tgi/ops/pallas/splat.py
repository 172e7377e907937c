"""Pallas TPU kernel: bilinear splat (the gather's transpose).

The gradient of tri-plane sampling w.r.t. the plane features is a
scatter-add of ~400k weighted [2, C] row-pair contributions per plane.
XLA lowers that scatter to ~7 µs/element serialized updates on TPU —
10+ seconds per render backward, ~200x the forward.

Kernel design (v5e, 16 MB VMEM):
  * The gradient plane lives in a VMEM scratch laid out [H, W*C (+128)] —
    flattening (W, C) into lanes avoids Mosaic's 128-lane padding of
    C=32 (which would quadruple the buffer) and keeps the whole plane
    resident across the point stream; it is DMA'd to HBM once per plane.
  * Each contribution is a 2C-lane vector placed at lane offset x*C.
    Unaligned dynamic lane slices are unsupported, so the update is
    rolled to offset (x*C) % 128 inside a 256-lane window starting at the
    128-aligned base — one read-modify-write per (point, row).
  * Point indices stream through SMEM blocks, update vectors through
    VMEM blocks.

Used as the custom-VJP backward of
tgi.ops.grid_sample.grid_sample_points on TPU; CPU keeps XLA autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

POINT_BLOCK = 2048
WINDOW = 256          # 128-aligned window covering any 2C slice, C <= 64
N_ACCUM = 4           # independent accumulators: breaks the RMW dependency
                      # chain so Mosaic can pipeline (150ms -> ~105ms)


def _kernel(y_start_ref, base_ref, off_ref, u_ref, out_hbm, *scratch):
    accs, sem = scratch[:-1], scratch[-1]

    @pl.when(pl.program_id(1) == 0)
    def _():
        for a in accs:
            a[...] = jnp.zeros_like(a)

    P = u_ref.shape[2]
    sub = y_start_ref.shape[3]
    C2 = u_ref.shape[4]
    K = len(accs)

    def body(p, _):
        # K interleaved, independent update chains.
        for k, a in enumerate(accs):
            q = p * K + k
            hi = q // sub
            lo = q % sub
            base = pl.multiple_of(base_ref[0, 0, hi, lo], 128)
            off = off_ref[0, 0, hi, lo]
            y_s = y_start_ref[0, 0, hi, lo]
            zero = jnp.zeros((2, WINDOW - C2), u_ref.dtype)
            u = jnp.concatenate([u_ref[0, 0, q], zero], axis=1)
            u = pltpu.roll(u, off, 1)
            # Two single-row RMWs: multi-row vector ops need 8-aligned
            # sublane starts, single rows don't.
            a[pl.ds(y_s, 1), pl.ds(base, WINDOW)] += u[0:1]
            a[pl.ds(y_s + 1, 1), pl.ds(base, WINDOW)] += u[1:2]
        return 0

    jax.lax.fori_loop(0, P // K, body, 0)

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        total = accs[0][...]
        for a in accs[1:]:
            total = total + a[...]
        accs[0][...] = total
        dma = pltpu.make_async_copy(accs[0].at[:, :out_hbm.shape[2]],
                                    out_hbm.at[pl.program_id(0)], sem)
        dma.start()
        dma.wait()


@functools.lru_cache(maxsize=None)
def _splat_for(H, W):
    """Batching-safe wrapper: vmap (e.g. batched inversion) lowers to a
    sequential map — the kernel's point stream is serialized anyway, so
    a batched call costs the same as B separate ones, and the ANY-space
    pallas output has no native batching rule."""
    @jax.custom_batching.sequential_vmap
    def fn(y_top, y_bot, x, w_top, w_bot, grads):
        return _plane_splat_impl(y_top, y_bot, x, w_top, w_bot, grads,
                                 H=H, W=W)
    return fn


def plane_splat(y_top, y_bot, x, w_top, w_bot, grads, *, H, W):
    return _splat_for(H, W)(y_top, y_bot, x, w_top, w_bot, grads)


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _plane_splat_impl(y_top, y_bot, x, w_top, w_bot, grads, *, H, W):
    """Accumulate weighted row-pair contributions into [G, H, W, C].

    Args:
        y_top, y_bot, x: [G, P] int32 clamped indices (x in [0, W-2],
            y_bot == min(y_top + 1, H-1)).
        w_top, w_bot: [G, P, 2] fp32 corner weights (0 for invalid
            corners; x clip-slot fixups already applied).
        grads: [G, P, C] fp32 incoming gradients.

    Returns:
        [G, H, W, C] fp32 accumulated gradient planes.

    Both rows are written in ONE [2, WINDOW] RMW per point: the row pair
    is re-based at y_start = min(y_top, H-2) with the row weights moved to
    the right slot when the pair is clamped at a border.
    """
    G, P, C = grads.shape
    assert 128 % C == 0 and 2 * C <= WINDOW
    pb = min(POINT_BLOCK, P)
    assert P % pb == 0, (P, pb)
    nb = P // pb
    per = 128 // C                        # columns per 128-lane tile

    # Row-slot fixups: rows (y_start, y_start+1) receive (w_top, w_bot)
    # except at the borders where the clamped pair collapses.
    y_start = jnp.clip(y_top, 0, H - 2)
    top_hi = (y_top >= H - 1)[..., None]       # top row at H-1 -> slot 1
    collapsed = (y_bot <= y_top)[..., None]    # y0 = -1 handled upstream
    r0 = jnp.where(top_hi, 0.0, w_top)
    r1 = jnp.where(top_hi, w_top + w_bot, w_bot)
    r0 = jnp.where(collapsed & ~top_hi, w_top + w_bot, r0)
    r1 = jnp.where(collapsed & ~top_hi, 0.0, r1)
    w_rows = jnp.stack([r0, r1], axis=2)       # [G, P, 2(row), 2(col)]

    # Update vectors: [2 rows, 2C lanes].
    u = (w_rows[..., None] * grads[:, :, None, None, :]).reshape(
        G, P, 2, 2 * C)
    base = (x // per) * 128
    off = (x % per) * C

    sub = pb // 8
    shape_idx = (G, nb, 8, sub)
    y_start = y_start.reshape(shape_idx)
    base = base.reshape(shape_idx)
    off = off.reshape(shape_idx)
    u = u.reshape(G, nb, pb, 2, 2 * C)

    smem = lambda: pl.BlockSpec((1, 1, 8, sub), lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        _kernel,
        grid=(G, nb),
        in_specs=[smem(), smem(), smem(),
                  pl.BlockSpec((1, 1, pb, 2, 2 * C),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((G, H, W * C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((H, W * C + 128), jnp.float32)
                        for _ in range(N_ACCUM)]
        + [pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(y_start, base, off, u)
    return out.reshape(G, H, W, C)
