"""Pallas TPU kernel: VMEM-resident footprint gather (forward experiment).

The tri-plane forward gather through XLA's gather engine costs
~12 µs/1k fetches (15 ms per render pass). This kernel keeps the
footprint-expanded plane [H*W, 128] resident in VMEM (17 MB bf16) and
streams point blocks, reading one 128-lane row per point — reads have no
dependency chain (unlike the splat RMWs), so Mosaic can pipeline them.

Returns the packed corner features f[e, 128] = (tl, tr, bl, br) x C; the
caller applies the bilinear weights (one [B, 4, C] x [B, 4] contraction
in XLA).
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
    assert L == 128
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
            pl.BlockSpec((1, HW, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, POINT_BLOCK, 128),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, Ppad, 128), exp_planes.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cells_b, exp_planes)
    return out[:, :P]
