"""Golden-value tests for the volumetric render math (SURVEY.md section 4b)."""

import numpy as np
import jax
import jax.numpy as jnp

from tgi.render import (ray_sampler, mip_ray_marcher, get_ray_limits_box,
                        linspace_batch, sample_pdf, sample_stratified,
                        unify_samples)
from tgi.render.cameras import (look_at_pose, fov_to_intrinsics, pack_camera,
                                rot6d_to_rotmat, rotmat_to_rot6d,
                                quaternion_to_rotmat)


def test_ray_sampler_pixel_centers():
    """Rays: unit norm, origins at camera, center pixel through the axis."""
    cam2world = np.eye(4, dtype=np.float32)[None]
    cam2world[0, 2, 3] = -2.7  # camera at z=-2.7 looking +z
    intr = np.asarray([[[4.2647, 0, 0.5], [0, 4.2647, 0.5], [0, 0, 1]]],
                      np.float32)
    o, d = ray_sampler(jnp.asarray(cam2world), jnp.asarray(intr), 4)
    o, d = np.asarray(o), np.asarray(d)
    assert o.shape == (1, 16, 3) and d.shape == (1, 16, 3)
    np.testing.assert_allclose(o, np.tile([[0, 0, -2.7]], (16, 1))[None],
                               atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-5)
    # All rays point forward (+z for identity rotation).
    assert (d[..., 2] > 0.9).all()
    # uv convention: first ray is the (x=0.125, y=0.125) pixel center —
    # slightly up-left of the axis -> negative x/y direction components.
    assert d[0, 0, 0] < 0 and d[0, 0, 1] < 0
    # Symmetry: mean direction is the optical axis.
    np.testing.assert_allclose(d.mean(axis=1)[0, :2], 0, atol=1e-6)


def test_ray_limits_box_brute_force(rng):
    o = rng.randn(64, 3).astype(np.float32) * 2
    d = rng.randn(64, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmin, tmax = get_ray_limits_box(jnp.asarray(o[None]), jnp.asarray(d[None]),
                                    box_side_length=2.0)
    tmin, tmax = np.asarray(tmin)[0, :, 0], np.asarray(tmax)[0, :, 0]
    # Brute force: march finely and compare inside-box intervals.
    ts = np.linspace(-10, 10, 20001, dtype=np.float32)
    pts = o[:, None, :] + ts[None, :, None] * d[:, None, :]
    inside = (np.abs(pts) <= 1.0 + 1e-4).all(-1)
    for i in range(64):
        idx = np.nonzero(inside[i])[0]
        if len(idx) > 2:
            np.testing.assert_allclose(tmin[i], ts[idx[0]], atol=5e-3)
            np.testing.assert_allclose(tmax[i], ts[idx[-1]], atol=5e-3)
        elif len(idx) == 0:
            assert tmin[i] == -1 and tmax[i] == -2


def test_linspace_batch():
    start = jnp.asarray([0.0, 1.0])
    stop = jnp.asarray([1.0, 3.0])
    out = np.asarray(linspace_batch(start, stop, 5))
    np.testing.assert_allclose(out[:, 0], np.linspace(0, 1, 5), rtol=1e-6)
    np.testing.assert_allclose(out[:, 1], np.linspace(1, 3, 5), rtol=1e-6)


def test_ray_marcher_numpy_golden(rng):
    """Compare against a straightforward numpy transcription of the volume
    rendering equation with midpoint samples and softplus(sigma-1)."""
    N, R, S, C = 1, 3, 6, 2
    colors = rng.rand(N, R, S, C).astype(np.float32)
    sigmas = rng.randn(N, R, S, 1).astype(np.float32)
    depths = np.sort(rng.rand(N, R, S, 1).astype(np.float32) + 2.0, axis=2)

    rgb, depth, weights = mip_ray_marcher(jnp.asarray(colors),
                                          jnp.asarray(sigmas),
                                          jnp.asarray(depths))
    rgb = np.asarray(rgb)

    # numpy golden
    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    cmid = (colors[:, :, :-1] + colors[:, :, 1:]) / 2
    smid = (sigmas[:, :, :-1] + sigmas[:, :, 1:]) / 2
    dmid = (depths[:, :, :-1] + depths[:, :, 1:]) / 2
    dens = np.log1p(np.exp(smid - 1))
    alpha = 1 - np.exp(-dens * deltas)
    T = np.cumprod(np.concatenate([np.ones_like(alpha[:, :, :1]),
                                   1 - alpha + 1e-10], axis=2), axis=2)[:, :, :-1]
    w = alpha * T
    want_rgb = (w * cmid).sum(2) * 2 - 1
    want_depth = (w * dmid).sum(2) / w.sum(2)
    np.testing.assert_allclose(rgb, want_rgb, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), want_depth, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(weights), w, rtol=1e-4, atol=1e-6)


def test_sample_pdf_deterministic_numpy(rng):
    """Det inverse-CDF draw against a numpy transcription."""
    R, B, NI = 4, 7, 5
    bins = np.sort(rng.rand(R, B + 1).astype(np.float32), axis=1)
    weights = rng.rand(R, B).astype(np.float32)
    got = np.asarray(sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins),
                                jnp.asarray(weights), NI, det=True))
    eps = 1e-5
    w = weights + eps
    pdf = w / w.sum(1, keepdims=True)
    cdf = np.concatenate([np.zeros((R, 1), np.float32),
                          np.cumsum(pdf, 1)], 1)
    u = np.tile(np.linspace(0, 1, NI, dtype=np.float32), (R, 1))
    inds = np.stack([np.searchsorted(cdf[i], u[i], side="right")
                     for i in range(R)])
    below = np.maximum(inds - 1, 0)
    above = np.minimum(inds, B)
    cg0 = np.take_along_axis(cdf, below, 1)
    cg1 = np.take_along_axis(cdf, above, 1)
    bg0 = np.take_along_axis(bins, below, 1)
    bg1 = np.take_along_axis(bins, above, 1)
    denom = np.where(cg1 - cg0 < eps, 1.0, cg1 - cg0)
    want = bg0 + (u - cg0) / denom * (bg1 - bg0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    # Samples must lie inside the bin range and be sorted for det draws.
    assert (got >= bins[:, :1] - 1e-6).all() and (got <= bins[:, -1:] + 1e-6).all()
    assert (np.diff(got, axis=1) >= -1e-6).all()


def test_stratified_det_uniform():
    o = jnp.zeros((1, 2, 3))
    d = np.asarray(sample_stratified(jax.random.PRNGKey(0), o, 2.25, 3.3, 4,
                                     det=True))
    np.testing.assert_allclose(d[0, 0, :, 0], np.linspace(2.25, 3.3, 4),
                               rtol=1e-6)


def test_unify_samples_sorted(rng):
    d1 = np.sort(rng.rand(1, 2, 4, 1).astype(np.float32), axis=2)
    d2 = np.sort(rng.rand(1, 2, 3, 1).astype(np.float32), axis=2)
    c1 = rng.rand(1, 2, 4, 5).astype(np.float32)
    c2 = rng.rand(1, 2, 3, 5).astype(np.float32)
    s1 = rng.rand(1, 2, 4, 1).astype(np.float32)
    s2 = rng.rand(1, 2, 3, 1).astype(np.float32)
    ad, ac, asig = unify_samples(*(jnp.asarray(v) for v in
                                   (d1, c1, s1, d2, c2, s2)))
    ad = np.asarray(ad)
    assert ad.shape == (1, 2, 7, 1)
    assert (np.diff(ad[..., 0], axis=-1) >= 0).all()
    # Color rows still pair with their original depth.
    flat = {round(float(x), 6) for x in d1.ravel()} | \
           {round(float(x), 6) for x in d2.ravel()}
    assert {round(float(x), 6) for x in ad.ravel()} == flat
    pairs = {(round(float(d), 5), round(float(c), 5))
             for d, c in zip(np.concatenate([d1, d2], 2).ravel(),
                             np.concatenate([c1, c2], 2)[..., 0].ravel())}
    got_pairs = {(round(float(d), 5), round(float(c), 5))
                 for d, c in zip(ad.ravel(), np.asarray(ac)[..., 0].ravel())}
    assert got_pairs == pairs


def test_merged_march_equals_unify_plus_marcher(rng):
    """The TPU-shaped fused path must match the reference formulation."""
    from tgi.render.importance import merged_march
    N, M, S1, S2, C = 1, 7, 6, 5, 4
    d1 = np.sort(rng.rand(N, M, S1, 1).astype(np.float32) + 2, axis=2)
    d2 = np.sort(rng.rand(N, M, S2, 1).astype(np.float32) + 2, axis=2)
    c1 = rng.rand(N, M, S1, C).astype(np.float32)
    c2 = rng.rand(N, M, S2, C).astype(np.float32)
    s1 = rng.randn(N, M, S1, 1).astype(np.float32)
    s2 = rng.randn(N, M, S2, 1).astype(np.float32)
    args = tuple(jnp.asarray(v) for v in (d1, c1, s1, d2, c2, s2))

    ad, ac, asig = unify_samples(*args)
    want_rgb, want_depth, want_w = mip_ray_marcher(ac, asig, ad)
    got_rgb, got_depth, got_w = merged_march(*args)
    np.testing.assert_allclose(np.asarray(got_rgb), np.asarray(want_rgb),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_depth), np.asarray(want_depth),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w),
                               rtol=1e-5, atol=1e-6)


def test_camera_pack_and_lookat():
    cam = look_at_pose(np.pi / 2, np.pi / 2, jnp.asarray([0., 0., 0.2]),
                       radius=2.7)
    intr = fov_to_intrinsics(18.837)
    c = pack_camera(cam[None] if cam.ndim == 2 else cam, intr)
    assert c.shape == (1, 25)
    cam = np.asarray(cam)
    # h=pi/2, v=pi/2 -> camera on -z? Reference convention: x=r sin(v)cos(pi-h)=0,
    # z=r sin(v) sin(pi-h)=r, y=r cos(v)=0 -> camera at (0, 0, 2.7).
    np.testing.assert_allclose(cam[..., :3, 3].reshape(3), [0, 0, 2.7],
                               atol=1e-5)
    # Rotation is orthonormal with det +1.
    R = cam[..., :3, :3][0] if cam.ndim == 3 else cam[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, rtol=1e-5)


def test_rot6d_roundtrip(rng):
    from scipy.spatial.transform import Rotation as _R  # noqa
    R = _R.random(8, random_state=0).as_matrix().astype(np.float32)
    six = rotmat_to_rot6d(jnp.asarray(R))
    back = np.asarray(rot6d_to_rotmat(six))
    # The reference's +1e-4 degeneracy guard bounds roundtrip accuracy.
    np.testing.assert_allclose(back, R, atol=1e-3)


def test_quaternion_identity():
    q = jnp.asarray([[1., 0., 0., 0.], [0., 1., 0., 0.]])
    R = np.asarray(quaternion_to_rotmat(q))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(R[1], np.diag([1., -1., -1.]), atol=1e-6)


def test_rotmat_to_quat_roundtrip():
    """rotmat_to_quat inverts quaternion_to_rotmat (up to sign; w >= 0
    canonical), including near-degenerate small-w rotations."""
    from scipy.spatial.transform import Rotation as _R
    from tgi.render.cameras import rotmat_to_quat

    R = _R.random(32, random_state=7).as_matrix().astype(np.float32)
    # Add the degenerate cases: identity and 180-degree rotations about
    # each axis (w = 0 branch of Shepperd's method).
    R = np.concatenate([R, np.eye(3)[None],
                        np.stack([np.diag(d).astype(np.float32) for d in
                                  ([1, -1, -1], [-1, 1, -1], [-1, -1, 1])])])
    q = rotmat_to_quat(jnp.asarray(R))
    back = np.asarray(quaternion_to_rotmat(q))
    np.testing.assert_allclose(back, R, atol=1e-5)
    assert (np.asarray(q)[:, 0] >= -1e-7).all()
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1),
                               1.0, atol=1e-6)


def test_axis_angle_rotmat():
    from tgi.render.cameras import axis_angle_rotmat

    A = np.asarray(axis_angle_rotmat(jnp.asarray([0.3, -0.5, 0.8]),
                                     np.radians(3.0)))
    np.testing.assert_allclose(A @ A.T, np.eye(3), atol=1e-6)
    ang = np.degrees(np.arccos(np.clip((np.trace(A) - 1) / 2, -1, 1)))
    np.testing.assert_allclose(ang, 3.0, rtol=1e-4)
