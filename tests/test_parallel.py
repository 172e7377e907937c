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


def test_ray_sharded_render_backward_matches():
    """Forward AND backward of the ray-sharded render: grads w.r.t. the
    (replicated) planes and decoder from a rays-sharded loss must match
    the single-device grads — GSPMD inserts the psum over the ray axis.
    (On CPU the backward is the XLA autodiff of the gather formulation;
    the Pallas splat route is TPU-only and is verified on-chip.)"""
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

    def loss(planes, dec, ro, rd):
        rgb, depth, _ = importance_render(planes, dec, ro, rd, rk, det=True)
        return jnp.sum(rgb ** 2) + jnp.sum(jnp.sin(depth))

    grad_fn = jax.grad(loss, argnums=(0, 1))
    want = jax.jit(grad_fn)(planes, params["decoder"], ro, rd)

    mesh = make_mesh(8, rays=8)
    rs = ray_sharding(mesh, axis=1, ndim=3)
    rep = NamedSharding(mesh, P())
    sharded = jax.jit(grad_fn, in_shardings=(rep, None, rs, rs),
                      out_shardings=(rep, None))
    got = sharded(replicate(mesh, planes),
                  replicate(mesh, params["decoder"]),
                  jax.device_put(ro, rs), jax.device_put(rd, rs))
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-4, atol=1e-5)


def test_ray_constrained_synthesis_matches():
    """tgi.parallel.ray_constrained (the trace-time hook the multichip
    dryrun's ray-sharded projection step uses): a FULL G.synthesis traced
    under the context — constraint applied inside importance_render, all
    inputs replicated — must match the unsharded render. GSPMD shards
    the volumetric interior and inserts the collectives."""
    from tgi.parallel import ray_constrained

    G = TriPlaneGenerator(tiny_config())
    params = G.init(jax.random.PRNGKey(0))
    ws = jnp.full((1, G.cfg.num_ws, 32), 0.1)
    c = camera_batch(1)

    def make_fn():
        return jax.jit(lambda p, w, cc: G.synthesis(p, w, cc,
                                                    det=True)["image"])

    want = make_fn()(params, ws, c)

    mesh = make_mesh(8, rays=8)
    fn = make_fn()
    with mesh, ray_constrained(mesh):
        got = fn(*replicate(mesh, (params, ws, c)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_data_sharded_inversion_step():
    """One batched-inversion step (Projector._make_step_batched, the
    paper-core path) with the per-image state and targets sharded over
    the 8-device data axis must match the unsharded vmapped result —
    the DP semantics of reference training_loop.py:193-300 applied to
    inversion."""
    from tgi.invert import Projector, ProjectorConfig
    from tgi.models.pose_resnet import resnet34_init
    from tgi.models.vgg import lpips_features, lpips_head_init, vgg16_init

    G = TriPlaneGenerator(tiny_config())
    key = jax.random.PRNGKey(0)
    kg, kv, kh, kp = jax.random.split(key, 4)
    gen = G.init(kg)
    vgg = vgg16_init(kv)
    head = lpips_head_init(kh)
    pose = resnet34_init(kp, output_dims=4)
    cfg = ProjectorConfig(num_steps=4, cam_preheat_steps=0, w_avg_samples=8,
                          camera_mode="quat", initial_noise_factor=0.0)
    proj = Projector(G, gen, vgg, head, pose, cfg)

    B = 8
    targets = jax.random.uniform(jax.random.PRNGKey(5), (B, 1, 3, 64, 64),
                                 maxval=255.0)
    tfeats = jax.vmap(lambda t: lpips_features(vgg, head, t))(targets)
    init_keys = jax.random.split(jax.random.PRNGKey(6), B)
    ts, opt_states, w_std = jax.vmap(proj.init_state)(init_keys, targets)
    loop_keys = jax.random.split(jax.random.PRNGKey(7), B)

    step = proj._make_step_batched(w_std[0], preheat=False)
    vstep = jax.vmap(step, in_axes=((0, 0, 0), None, 0, 0))

    def one(ts_, os_, keys, targets, tfeats):
        (ts2, _, _), metrics = vstep((ts_, os_, keys), jnp.asarray(2),
                                     targets, tfeats)
        return ts2["w"], metrics["loss"]

    want_w, want_loss = jax.jit(one)(ts, opt_states, loop_keys, targets,
                                     tfeats)

    mesh = make_mesh(8)
    shard = lambda t: shard_batch(mesh, t)
    sharded = jax.jit(one)
    got_w, got_loss = sharded(shard(ts), shard(opt_states),
                              shard(loop_keys), shard(targets),
                              shard(tfeats))
    np.testing.assert_allclose(np.asarray(got_loss), np.asarray(want_loss),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w),
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
