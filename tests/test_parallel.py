"""Mesh sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.test_generator import tiny_config, camera_batch
from tgi.models import TriPlaneGenerator
from tgi.parallel import (data_sharding, make_mesh, ray_sharding, replicate,
                          shard_batch)


def test_make_mesh_axes():
    mesh = make_mesh(8, rays=2)
    assert mesh.shape == {"data": 4, "rays": 2}
    mesh1 = make_mesh(8)
    assert mesh1.shape == {"data": 8, "rays": 1}


def test_ray_sharded_render_matches_unsharded():
    """importance_render with the ray axis sharded over 8 devices must be
    numerically identical to the single-device result — the render is
    embarrassingly parallel along M (SURVEY.md section 5.7)."""
    from tgi.render.rays import ray_sampler
    from tgi.render.renderer import importance_render

    G = TriPlaneGenerator(tiny_config())
    params = G.init(jax.random.PRNGKey(0))
    ws = jnp.zeros((1, G.cfg.num_ws, 32))
    planes = G.backbone_planes(params, ws).astype(jnp.float32)
    c = camera_batch(1)
    ro, rd = ray_sampler(c[:, :16].reshape(1, 4, 4),
                         c[:, 16:25].reshape(1, 3, 3), 16)
    rk = G.cfg.rendering_kwargs

    def render(planes, dec, ro, rd):
        rgb, depth, wsum = importance_render(planes, dec, ro, rd, rk,
                                             det=True)
        return rgb, depth

    want = jax.jit(render)(planes, params["decoder"], ro, rd)

    mesh = make_mesh(8, rays=8)
    rs = ray_sharding(mesh, axis=1, ndim=3)
    rep = NamedSharding(mesh, P())
    sharded = jax.jit(render,
                      in_shardings=(rep, None, rs, rs),
                      out_shardings=(ray_sharding(mesh, 1, 3),
                                     ray_sharding(mesh, 1, 3)))
    got = sharded(replicate(mesh, planes),
                  replicate(mesh, params["decoder"]),
                  jax.device_put(ro, rs), jax.device_put(rd, rs))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               rtol=2e-4, atol=2e-5)


def test_data_sharded_batch():
    mesh = make_mesh(8)
    x = jnp.arange(8 * 4.0).reshape(8, 4)
    xs = shard_batch(mesh, {"x": x})["x"]
    assert xs.sharding.spec == P("data", None)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_sharded_generator_forward():
    """Full generator forward with the batch sharded over all 8 devices."""
    G = TriPlaneGenerator(tiny_config())
    params = G.init(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    z = jax.random.normal(jax.random.PRNGKey(1), (8, 32))
    c = camera_batch(8)

    @jax.jit
    def fwd(params, z, c):
        return G(params, z, c, det=True)["image"]

    want = fwd(params, z, c)
    params_r = replicate(mesh, params)
    z_s, c_s = shard_batch(mesh, (z, c))
    got = fwd(params_r, z_s, c_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
