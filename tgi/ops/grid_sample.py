"""Bilinear grid sampling — the tri-plane render hot spot.

TPU-native replacement for ``torch.nn.functional.grid_sample`` (bilinear,
``align_corners=False``, zeros padding) as used by the reference tri-plane
sampler (training/volumetric_rendering/renderer.py:55-66). JAX has no
native grid_sample; this formulates it as four row-gathers from an
``[HW, C]``-transposed feature map plus a lerp — a layout where the gather
runs along the sublane axis and the channel axis stays vectorized, which
XLA maps well onto TPU. On TPU the backward scatter runs the Pallas splat
kernel (``tgi.ops.pallas.splat``) via custom VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _unnormalize(coord, size):
    """align_corners=False: map [-1, 1] to pixel centers [-0.5, size-0.5]."""
    return (coord + 1.0) * (size / 2.0) - 0.5


def grid_sample_2d(img: jax.Array, grid: jax.Array) -> jax.Array:
    """Bilinear sample ``img`` at ``grid`` locations.

    Args:
        img: ``[N, C, H, W]`` feature maps.
        grid: ``[N, Hg, Wg, 2]`` normalized coords in [-1, 1]; channel 0 is
            x (width), channel 1 is y (height).

    Returns:
        ``[N, C, Hg, Wg]``, matching torch grid_sample(align_corners=False,
        padding_mode='zeros', mode='bilinear'). Routed through the
        point-list implementation (paired-slice gathers; Pallas splat
        backward on TPU).
    """
    N, C, H, W = img.shape
    _, Hg, Wg, _ = grid.shape
    out = grid_sample_points(img, grid.reshape(N, Hg * Wg, 2))  # [N, P, C]
    return jnp.transpose(out, (0, 2, 1)).reshape(N, C, Hg, Wg)


def _gather_row_pair(img_nhwc, y, x0, H, W):
    """Gather the (x0, x0+1) column pair of row ``y`` for each point.

    img_nhwc: [N, H, W, C]; y, x0: [N, P] int32 (may be out of range).
    Returns [N, P, 2, C]. One sliced lax.gather with a 2-wide W window —
    both x-corners arrive in a single contiguous fetch. (Measured on v5e:
    2 paired-row gathers beat both 4 per-corner gathers and a single
    2x2-window gather, which spans two non-contiguous rows.)
    """
    N, _, _, C = img_nhwc.shape
    yc = jnp.clip(y, 0, H - 1)
    xc = jnp.clip(x0, 0, W - 2)
    starts = jnp.stack([yc, xc], axis=-1)               # [N, P, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3), collapsed_slice_dims=(1,),
        start_index_map=(1, 2), operand_batching_dims=(0,),
        start_indices_batching_dims=(0,))
    return jax.lax.gather(img_nhwc, starts, dnums,
                          slice_sizes=(1, 1, 2, C),
                          mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _pair_corners(pair, x0, y, H, W, dtype):
    """Split a [N, P, 2, C] pair fetch into masked (v_left, v_right)."""
    # When x0 == W-1 the clipped window is (W-2, W-1): the left value is at
    # slot 1. When x0 == -1 the window is (0, 1): the right value is at 0.
    left_hi = (x0 >= W - 1)[..., None]
    right_lo = (x0 < 0)[..., None]
    v_l = jnp.where(left_hi, pair[:, :, 1], pair[:, :, 0])
    v_r = jnp.where(right_lo, pair[:, :, 0], pair[:, :, 1])
    y_ok = ((y >= 0) & (y < H))[..., None]
    l_ok = (y_ok & ((x0 >= 0) & (x0 < W))[..., None]).astype(dtype)
    r_ok = (y_ok & ((x0 + 1 >= 0) & (x0 + 1 < W))[..., None]).astype(dtype)
    return v_l * l_ok, v_r * r_ok


def _point_indices(coords, H, W):
    """(x0, y0 int32 floors, wx, wy fp fractions [..., None])."""
    g = coords.astype(jnp.float32)
    ix = _unnormalize(g[..., 0], W)
    iy = _unnormalize(g[..., 1], H)
    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    return (x0f.astype(jnp.int32), y0f.astype(jnp.int32),
            (ix - x0f)[..., None], (iy - y0f)[..., None])


def _combine_pairs(top_pair, bot_pair, coords, hw, dtype):
    """Bilinear lerp of the two gathered row-pairs."""
    H, W = hw
    x0, y0, wx, wy = _point_indices(coords, H, W)
    wx = wx.astype(dtype)
    wy = wy.astype(dtype)
    v00, v01 = _pair_corners(top_pair, x0, y0, H, W, dtype)
    v10, v11 = _pair_corners(bot_pair, x0, y0 + 1, H, W, dtype)
    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    return top + (bot - top) * wy


def _grid_sample_points_impl(img: jax.Array, coords: jax.Array) -> jax.Array:
    N, C, H, W = img.shape
    x0, y0, _, _ = _point_indices(coords, H, W)
    img_nhwc = jnp.transpose(img, (0, 2, 3, 1))
    top_pair = _gather_row_pair(img_nhwc, y0, x0, H, W)
    bot_pair = _gather_row_pair(img_nhwc, y0 + 1, x0, H, W)
    return _combine_pairs(top_pair, bot_pair, coords, (H, W), img.dtype)


def _corner_weights(x0, y0, wx, wy, H, W):
    """Per-point row-pair splat weights with validity masks and clip-slot
    fixups, matching _pair_corners' forward conventions.

    Returns (y_top, y_bot, x_clamped, w_top [N,P,2], w_bot [N,P,2]).
    """
    wx = wx[..., 0]
    wy = wy[..., 0]

    def row_weights(y, wl, wr):
        y_ok = (y >= 0) & (y < H)
        l_ok = (y_ok & (x0 >= 0) & (x0 < W)).astype(wl.dtype)
        r_ok = (y_ok & (x0 + 1 >= 0) & (x0 + 1 < W)).astype(wl.dtype)
        wl = wl * l_ok
        wr = wr * r_ok
        # Clipped windows: x0==W-1 -> left value sits in slot 1;
        # x0==-1 -> right value sits in slot 0.
        left_hi = x0 >= W - 1
        right_lo = x0 < 0
        slot0 = jnp.where(left_hi, 0.0, jnp.where(right_lo, wr, wl))
        slot1 = jnp.where(left_hi, wl, jnp.where(right_lo, 0.0, wr))
        return jnp.stack([slot0, slot1], axis=-1)

    w_top = row_weights(y0, (1 - wx) * (1 - wy), wx * (1 - wy))
    w_bot = row_weights(y0 + 1, (1 - wx) * wy, wx * wy)
    y_top = jnp.clip(y0, 0, H - 1)
    y_bot = jnp.clip(y0 + 1, 0, H - 1)
    x_c = jnp.clip(x0, 0, W - 2)
    return y_top, y_bot, x_c, w_top, w_bot


def _expand_footprint(img):
    """[N, C, H, W] -> [N, H*W, 4C]: each cell carries its 2x2 bilinear
    footprint (self, right, down, down-right; zeros past the border), so
    a point's whole footprint is ONE flat row fetch. One fetch per point
    through the gather engine runs ~2x the two row-pair fetches
    (measured 8.6 vs 15.8 ms per render pass on v5e)."""
    N, C, H, W = img.shape
    nhwc = jnp.transpose(img, (0, 2, 3, 1))
    right = jnp.pad(nhwc[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    down = jnp.pad(nhwc[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    dr = jnp.pad(nhwc[:, 1:, 1:], ((0, 0), (0, 1), (0, 1), (0, 0)))
    e = jnp.concatenate([nhwc, right, down, dr], axis=-1)
    return e.reshape(N, H * W, 4 * C)


def _corner_values(f4, slots, valid, dtype):
    """f4: [N, P, 4, C] fetched slot values; -> (v00, v01, v10, v11) true
    corner values (OOB corners zeroed, border slot remap inverted)."""
    vs = []
    for k in range(4):
        sl = slots[..., k:k + 1, None]
        v = jnp.sum(jnp.where(sl == jnp.arange(4)[None, None, :, None],
                              f4, 0), axis=2)
        vs.append(v * valid[..., k:k + 1].astype(dtype))
    return vs


@functools.lru_cache(maxsize=None)
def _gsp_tpu_for(point_layout):
    """custom-VJP gather with a static (Ry, Rx, S) ray-layout hint that
    the Pallas splat backward uses for spatially local entry blocks."""
    from tgi.ops.pallas.splat_pack import corner_slots

    def gather_corners(img, coords):
        # Footprint-expanded single-fetch gather. Full precision: the
        # backward's d_coords takes corner DIFFERENCES, where bf16
        # rounding cancels catastrophically (verified by test).
        #
        # TGI_GATHER routes the row fetch: 'vmem' (default) keeps the
        # fp32 expanded plane resident in VMEM and reads one row/point
        # through a Pallas kernel (4.9 vs 7.7 ms/pass through XLA's
        # gather engine at the flagship shape — scripts/
        # bench_gather_vmem.py); 'xla' is take_along_axis. The MXU
        # one-hot tile-walk variant measured 10.3 ms and was dropped.
        import os
        N, C, H, W = img.shape
        x0, y0, wx, wy = _point_indices(coords, H, W)
        y0c, x0c, slots, valid = corner_slots(y0, x0, H, W)
        cell = y0c * W + x0c
        if os.environ.get("TGI_GATHER", "vmem") == "vmem" and 4 * C in (
                64, 128):
            from tgi.ops.pallas.gather_vmem import gather_rows_vmem
            # fp32 plane rows: Mosaic rejects bf16 single-row dynamic
            # reads, and the fp32 loop beats the bf16 bitcast variant
            # anyway (4.9 vs 6.9 ms); the upcast also gives exact fp32
            # residuals for d_coords.
            exp = _expand_footprint(img.astype(jnp.float32))
            fetched = gather_rows_vmem(exp, cell)
        else:
            exp = _expand_footprint(img.astype(jnp.float32))
            fetched = jnp.take_along_axis(exp, cell[..., None], axis=1)
        f4 = fetched.reshape(N, -1, 4, C)
        v00, v01, v10, v11 = _corner_values(f4, slots, valid, jnp.float32)
        wx32 = wx.astype(jnp.float32)
        wy32 = wy.astype(jnp.float32)
        top = v00 + (v01 - v00) * wx32
        bot = v10 + (v11 - v10) * wx32
        out = (top + (bot - top) * wy32).astype(img.dtype)
        return out, (v00, v01, v10, v11)

    @jax.custom_vjp
    def f(img, coords):
        # Primal (forward-only renders, e.g. the gen_videos loop) takes
        # the same fast gather as the VJP forward.
        out, _ = gather_corners(img, coords)
        return out

    def fwd(img, coords):
        # The fetched corner values are saved as VJP residuals
        # (d_coords needs them; re-gathering costs ~15 ms/pass).
        out, corners = gather_corners(img, coords)
        return out, (img, coords, corners)

    def bwd(res, g):
        return _gsp_bwd(res, g, point_layout)

    f.defvjp(fwd, bwd)
    return f


def _gsp_bwd(res, g, point_layout=None):
    """Backward: d_img via a Pallas splat kernel (XLA's scatter lowering
    costs ~10 s/frame on TPU); d_coords from the corner pairs saved by
    the forward (re-gathering them costs ~15 ms/pass).

    Kernel selection (TGI_SPLAT): 'pack' (default) = footprint-packed
    tiled one-hot MXU matmuls (tgi/ops/pallas/splat_pack.py); 'v1' =
    serialized-RMW kernel; 'mxu' = sorted segment-sum variant (slower —
    kept for comparison).
    """
    import os
    from tgi.ops.pallas.splat import POINT_BLOCK, plane_splat
    img, coords, corners = res
    N, C, H, W = img.shape
    P = coords.shape[1]
    x0, y0, wx, wy = _point_indices(coords, H, W)

    # d_coords from the saved corner values (the formula autodiff
    # derives).
    v00, v01, v10, v11 = corners
    g32 = g.astype(jnp.float32)
    dix = jnp.sum(((v01 - v00) * (1 - wy) + (v11 - v10) * wy) * g32, -1)
    diy = jnp.sum(((v10 - v00) * (1 - wx) + (v11 - v01) * wx) * g32, -1)
    d_coords = jnp.stack([dix * (W / 2.0), diy * (H / 2.0)],
                         axis=-1).astype(coords.dtype)

    mode = os.environ.get("TGI_SPLAT", "pack")
    if mode == "pack" and not (4 * C == 128 and H % 16 == 0 and W % 16 == 0):
        # splat_pack packs 4 corner slots x C channels into exactly 128
        # lanes and tiles cells 16x16; other shapes (e.g. C=16 test
        # planes) take the serialized-RMW kernel, which handles any
        # C <= 64.
        mode = "v1"
    if mode == "pack":
        from tgi.ops.pallas.splat_pack import plane_splat_pack
        wxs = wx[..., 0]
        wys = wy[..., 0]
        w4 = jnp.stack([(1 - wxs) * (1 - wys), wxs * (1 - wys),
                        (1 - wxs) * wys, wxs * wys], axis=-1)
        d_img_nhwc = plane_splat_pack(y0, x0, w4.astype(jnp.float32), g32,
                                      H=H, W=W, point_layout=point_layout)
        d_img = jnp.transpose(d_img_nhwc, (0, 3, 1, 2)).astype(img.dtype)
        return d_img, d_coords
    if mode == "v1":
        # v1: serialized-RMW kernel (pad P to its block size).
        y_top, y_bot, x_c, w_top, w_bot = _corner_weights(x0, y0, wx, wy,
                                                          H, W)
        pad = (-P) % POINT_BLOCK
        if pad:
            zi = lambda a: jnp.pad(a, ((0, 0), (0, pad)))
            zw = lambda a: jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
            y_top, y_bot, x_c = zi(y_top), zi(y_bot), zi(x_c)
            w_top, w_bot, g32 = zw(w_top), zw(w_bot), zw(g32)
        d_img_nhwc = plane_splat(y_top, y_bot, x_c,
                                 w_top.astype(jnp.float32),
                                 w_bot.astype(jnp.float32), g32, H=H, W=W)
    else:
        from tgi.ops.pallas.splat_mxu import plane_splat_mxu
        wxs = wx[..., 0]
        wys = wy[..., 0]
        w4 = jnp.stack([(1 - wxs) * (1 - wys), wxs * (1 - wys),
                        (1 - wxs) * wys, wxs * wys], axis=-1)
        d_img_nhwc = plane_splat_mxu(y0, x0, w4.astype(jnp.float32), g32,
                                     H=H, W=W)
    d_img = jnp.transpose(d_img_nhwc, (0, 3, 1, 2)).astype(img.dtype)
    return d_img, d_coords


def _grid_sample_points_dense(img: jax.Array, coords: jax.Array) -> jax.Array:
    """One-hot matmul formulation for SMALL grids with wide channels:
    feats = W_sparse @ img_flat, where W holds the 4 bilinear corner
    weights per point. Natively differentiable — the backward is the
    transposed matmul, so no scatter appears (the warp loss's
    [1, 256, 64, 64] VGG-feature sampling hits XLA's serialized scatter
    otherwise). Cost: P x HW x C MACs on the MXU — only viable when HW is
    tiny (<= ~4k cells)."""
    N, C, H, W = img.shape
    P = coords.shape[1]
    g = coords.astype(jnp.float32)
    ix = _unnormalize(g[..., 0], W)
    iy = _unnormalize(g[..., 1], H)
    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    wx = ix - x0f
    wy = iy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    cells = jax.lax.broadcasted_iota(jnp.int32, (1, 1, H * W), 2)
    img_flat = img.reshape(N, C, H * W).astype(jnp.float32)
    oh = 0.0
    for dy, dx, w in ((0, 0, (1 - wx) * (1 - wy)), (0, 1, wx * (1 - wy)),
                      (1, 0, (1 - wx) * wy), (1, 1, wx * wy)):
        yy = y0 + dy
        xx = x0 + dx
        ok = ((yy >= 0) & (yy < H) & (xx >= 0) & (xx < W))
        cell = jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)
        oh = oh + (cell[..., None] == cells) * jnp.where(ok, w, 0.0)[..., None]
    out = jnp.einsum("nph,nch->npc", oh, img_flat)
    return out.astype(img.dtype)


def grid_sample_points(img: jax.Array, coords: jax.Array,
                       point_layout=None) -> jax.Array:
    """Point-list variant: img [N, C, H, W], coords [N, P, 2] -> [N, P, C].

    The volumetric-render hot path (renderer.py:55-66 in the reference is
    an F.grid_sample over ~400k points/frame). Two paired-slice gathers
    (top row pair, bottom row pair) replace four per-corner gathers. On
    TPU the backward runs a Pallas splat kernel via custom VJP; other
    backends use plain XLA autodiff.

    point_layout: optional static (Ry, Rx, S) hint — coords are a ray
    grid Ry x Rx with S samples per ray, ray-major. The splat backward
    reorders entries into spatially local blocks with it.
    """
    C = img.shape[1]
    H, W = img.shape[2:]
    if jax.default_backend() == "tpu":
        if 128 % C == 0 and C <= 64:
            # The splat kernels pack channels into 128-lane tiles; other
            # channel counts take the routes below.
            return _gsp_tpu_for(point_layout)(img, coords)
        if H * W <= 4096 and C >= 64:
            # Small grid, wide channels (warp loss VGG features): dense
            # one-hot matmuls; autodiff stays matmul-shaped.
            return _grid_sample_points_dense(img, coords)
    return _grid_sample_points_impl(img, coords)


def project_onto_planes(coords: jax.Array) -> jax.Array:
    """Project world points onto the three EG3D tri-plane axes.

    coords: [N, M, 3] -> [N, 3, M, 2]. Axis convention matches the
    reference ``generate_planes``/``project_onto_planes``
    (renderer.py:23-53), including its (z, x) third plane: the projections
    are (x, y), (x, z), (z, x).
    """
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    p0 = jnp.stack([x, y], axis=-1)
    p1 = jnp.stack([x, z], axis=-1)
    p2 = jnp.stack([z, x], axis=-1)
    return jnp.stack([p0, p1, p2], axis=1)


def sample_triplanes(planes: jax.Array, coords: jax.Array,
                     box_warp: float, point_layout=None) -> jax.Array:
    """Sample tri-plane features at 3D points.

    Args:
        planes: ``[N, 3, C, H, W]`` tri-plane features.
        coords: ``[N, M, 3]`` world coordinates.
        box_warp: side length of the [-box/2, box/2] volume.
        point_layout: optional static (Ry, Rx, S) ray-grid structure of
            the M axis (see grid_sample_points).

    Returns:
        ``[N, 3, M, C]`` per-plane bilinear features (zeros outside the
        box), matching reference ``sample_from_planes``.
    """
    N, n_planes, C, H, W = planes.shape
    M = coords.shape[1]
    coords = (2.0 / box_warp) * coords
    proj = project_onto_planes(coords)                     # [N, 3, M, 2]
    planes_flat = planes.reshape(N * n_planes, C, H, W)
    proj_flat = proj.reshape(N * n_planes, M, 2)
    feats = grid_sample_points(planes_flat, proj_flat,
                               point_layout=point_layout)  # [N*3, M, C]
    return feats.reshape(N, n_planes, M, C)
