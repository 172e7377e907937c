"""Parity tests for bilinear grid sampling vs torch.nn.functional.grid_sample."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tgi.ops import grid_sample_2d, sample_triplanes
from tgi.ops.grid_sample import grid_sample_points, project_onto_planes


def test_grid_sample_parity(rng):
    img = rng.randn(2, 5, 9, 7).astype(np.float32)
    grid = (rng.rand(2, 4, 6, 2).astype(np.float32) * 2.6 - 1.3)  # incl. OOB
    got = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    want = F.grid_sample(torch.as_tensor(img), torch.as_tensor(grid),
                         mode="bilinear", padding_mode="zeros",
                         align_corners=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grid_sample_points_matches_image_variant(rng):
    img = rng.randn(1, 3, 8, 8).astype(np.float32)
    pts = (rng.rand(1, 24, 2).astype(np.float32) * 2 - 1)
    a = np.asarray(grid_sample_points(jnp.asarray(img), jnp.asarray(pts)))
    b = np.asarray(grid_sample_2d(jnp.asarray(img),
                                  jnp.asarray(pts).reshape(1, 1, 24, 2)))
    np.testing.assert_allclose(a, np.transpose(b[:, :, 0], (0, 2, 1)),
                               rtol=1e-5, atol=1e-6)


def test_grid_sample_gradients(rng):
    img = rng.randn(1, 2, 6, 6).astype(np.float32)
    grid = (rng.rand(1, 3, 3, 2).astype(np.float32) * 1.8 - 0.9)

    def loss_j(g):
        return jnp.sum(grid_sample_2d(jnp.asarray(img), g) ** 2)

    gj = np.asarray(jax.grad(loss_j)(jnp.asarray(grid)))

    gt = torch.as_tensor(grid).requires_grad_(True)
    out = F.grid_sample(torch.as_tensor(img), gt, mode="bilinear",
                        padding_mode="zeros", align_corners=False)
    (out ** 2).sum().backward()
    np.testing.assert_allclose(gj, gt.grad.numpy(), rtol=1e-3, atol=1e-4)


def torch_plane_axes():
    return torch.tensor([[[1, 0, 0], [0, 1, 0], [0, 0, 1]],
                         [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
                         [[0, 0, 1], [1, 0, 0], [0, 1, 0]]],
                        dtype=torch.float32)


def test_project_onto_planes_matches_reference_math(rng):
    coords = rng.randn(2, 11, 3).astype(np.float32)
    got = np.asarray(project_onto_planes(jnp.asarray(coords)))  # [N,3,M,2]

    planes = torch_plane_axes()
    ct = torch.as_tensor(coords)
    N, M, _ = ct.shape
    cexp = ct.unsqueeze(1).expand(-1, 3, -1, -1).reshape(N * 3, M, 3)
    inv = torch.linalg.inv(planes).unsqueeze(0).expand(N, -1, -1, -1)
    inv = inv.reshape(N * 3, 3, 3)
    want = torch.bmm(cexp, inv)[..., :2].reshape(N, 3, M, 2).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sample_triplanes_parity(rng):
    """Full tri-plane sampling against the torch grid_sample composition."""
    planes = rng.randn(2, 3, 4, 8, 8).astype(np.float32)
    coords = rng.randn(2, 13, 3).astype(np.float32)
    box_warp = 2.0
    got = np.asarray(sample_triplanes(jnp.asarray(planes),
                                      jnp.asarray(coords), box_warp))

    pf = torch.as_tensor(planes).view(6, 4, 8, 8)
    ct = torch.as_tensor(coords) * (2.0 / box_warp)
    cexp = ct.unsqueeze(1).expand(-1, 3, -1, -1).reshape(6, 13, 3)
    inv = torch.linalg.inv(torch_plane_axes()).unsqueeze(0).expand(2, -1, -1, -1)
    proj = torch.bmm(cexp, inv.reshape(6, 3, 3))[..., :2].unsqueeze(1)
    want = F.grid_sample(pf, proj, mode="bilinear", padding_mode="zeros",
                         align_corners=False)
    want = want.permute(0, 3, 2, 1).reshape(2, 3, 13, 4).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_tpu_vjp_path_interpret(rng):
    """The TPU custom-VJP route (saved corner-pair residuals + the
    footprint-packed Pallas splat backward) matches XLA autodiff — run in
    Pallas interpret mode so it's testable off-chip."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from tgi.ops.grid_sample import (_grid_sample_points_impl, _gsp_tpu_for)

    img = jnp.asarray(rng.randn(3, 32, 32, 32).astype(np.float32))
    coords = jnp.asarray(
        (rng.rand(3, 1024, 2).astype(np.float32) * 2.4 - 1.2))

    def loss_ref(im, co):
        return jnp.sum(_grid_sample_points_impl(im, co) ** 2)

    fn = _gsp_tpu_for(None)

    def loss_tpu(im, co):
        return jnp.sum(fn(im, co) ** 2)

    with pltpu.force_tpu_interpret_mode():
        out = fn(img, coords)
        gi, gc = jax.grad(loss_tpu, argnums=(0, 1))(img, coords)
    out_ref = _grid_sample_points_impl(img, coords)
    gi_ref, gc_ref = jax.grad(loss_ref, argnums=(0, 1))(img, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=1e-5)
    # pack kernel accumulates bf16 payloads -> fp32: ~1e-2 relative.
    np.testing.assert_allclose(np.asarray(gi), np.asarray(gi_ref),
                               rtol=2e-2, atol=2e-2)
    # d_coords uses bf16-saved corner pairs (~0.4% relative).
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gc_ref),
                               rtol=2e-2, atol=2e-2)


def test_tpu_vjp_path_interpret_with_layout(rng):
    """Same, with a (Ry, Rx, S) point-layout reorder hint active."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from tgi.ops.grid_sample import (_grid_sample_points_impl, _gsp_tpu_for)

    Ry = Rx = 16
    S = 4
    P = Ry * Rx * S
    img = jnp.asarray(rng.randn(3, 32, 32, 32).astype(np.float32))
    coords = jnp.asarray(
        (rng.rand(3, P, 2).astype(np.float32) * 2.2 - 1.1))
    fn = _gsp_tpu_for((Ry, Rx, S))

    def loss_tpu(im):
        return jnp.sum(fn(im, coords) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gi = jax.grad(loss_tpu)(img)
    gi_ref = jax.grad(
        lambda im: jnp.sum(_grid_sample_points_impl(im, coords) ** 2))(img)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(gi_ref),
                               rtol=2e-2, atol=2e-2)
