"""Device meshes and sharding rules.

The reference's parallelism inventory (SURVEY.md section 2.12) is data
parallelism via torch DDP (rank-sharded loaders, flat-gradient NCCL
all_reduce) plus single-process DataParallel. The TPU-native mapping is a
``jax.sharding.Mesh`` with two axes:

  * ``data`` — batch axis: DP for GAN training, pose-estimator training,
    metric evaluation and batched inversion. Gradient all-reduce is the
    psum XLA inserts when the loss is computed from a batch-sharded input
    with replicated params.
  * ``rays`` — the render axis M = H*W (and the voxel axis for shape
    extraction): the principled 'model-ish' axis of a NeRF generator.
    Plane features (3x32x256x256 ≈ 25 MB fp32) are replicated; sampling,
    the decoder MLP and ray marching shard cleanly along rays with zero
    collectives until the final reshape.

No pipeline/tensor parallel machinery is warranted — the reference has no
model sharding of any kind; parity plus ray-sharding headroom is the goal.
"""

from __future__ import annotations

import contextlib
import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data: int | None = None,
              rays: int = 1, devices=None) -> Mesh:
    """Build a (data, rays) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if data is None:
        data = n // rays
    assert data * rays == n, (data, rays, n)
    arr = np.asarray(devices).reshape(data, rays)
    return Mesh(arr, axis_names=("data", "rays"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def ray_sharding(mesh: Mesh, axis: int = 1, ndim: int = 3) -> NamedSharding:
    """Shard the ray axis over 'rays' (default: [N, M, ...] layout)."""
    spec = [None] * ndim
    spec[axis] = "rays"
    return NamedSharding(mesh, P(*spec))


_RAY_CONSTRAINT_MESH: Mesh | None = None


@contextlib.contextmanager
def ray_constrained(mesh: Mesh):
    """Trace-time context: while active, ``importance_render`` pins its
    ray tensors to the mesh's 'rays' axis via with_sharding_constraint,
    so a FULL pipeline step (projection / PTI / video render) traced
    under the context shards its volumetric interior over chips even
    though its user-facing inputs (params, target, camera) are
    replicated. GSPMD propagates the constraint through sampling,
    decoding and marching (zero collectives until the image reshape) —
    the mechanics the ray-sharded-render parity tests verify leaf-level
    (tests/test_parallel.py), applied at step granularity."""
    global _RAY_CONSTRAINT_MESH
    prev = _RAY_CONSTRAINT_MESH
    _RAY_CONSTRAINT_MESH = mesh
    try:
        yield
    finally:
        _RAY_CONSTRAINT_MESH = prev


def constrain_ray_axis(x, axis: int = 1):
    """Apply the active ray-sharding constraint to axis ``axis`` of x
    (no-op outside a ray_constrained context, or when the ray axis does
    not divide over the mesh)."""
    mesh = _RAY_CONSTRAINT_MESH
    if mesh is None:
        return x
    n = mesh.shape.get("rays", 1)
    if n <= 1 or x.shape[axis] % n != 0:
        return x
    spec = [None] * x.ndim
    spec[axis] = "rays"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree):
    """Shard every leaf's axis 0 along 'data'."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), tree)
