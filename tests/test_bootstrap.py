"""Self-bootstrap of the gate's auxiliary nets (tgi/invert/bootstrap.py).

The closed-loop gate trains its pose/VGG nets from the generator itself
(reference protocol: scripts/gen_pseudo_dataset.py +
scripts/train_pose_estimator.py, extended to the projection VGG). Tiny
shapes; structural + learning-signal checks.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_generator import tiny_config
from tgi.models import TriPlaneGenerator
from tgi.models.pose_resnet import resnet34_init, resnet34_apply
from tgi.models.vgg import vgg16_init
from tgi.invert.bootstrap import (bootstrap_aux_nets, make_pseudo_dataset,
                                  train_vgg_bootstrap, _vgg_embed)


def test_pseudo_dataset_shapes_and_determinism():
    G = TriPlaneGenerator(tiny_config())
    params = G.init(jax.random.PRNGKey(0))
    ds = make_pseudo_dataset(G, params, jax.random.PRNGKey(3),
                             num_images=6, batch=4)
    assert ds["images_255"].shape == (6, 3, 64, 64)
    assert ds["exts"].shape == (6, 4, 4)
    assert ds["ws"].shape == (6, G.cfg.w_dim)
    assert ds["images_255"].min() >= 0 and ds["images_255"].max() <= 255
    # cam2world: rotation orthonormal, camera at radius 2.7
    R = ds["exts"][:, :3, :3]
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", R, R), np.tile(np.eye(3), (6, 1, 1)),
        atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(ds["exts"][:, :3, 3], axis=-1), 2.7, atol=1e-5)
    ds2 = make_pseudo_dataset(G, params, jax.random.PRNGKey(3),
                              num_images=6, batch=4)
    np.testing.assert_array_equal(ds["images_255"], ds2["images_255"])


def test_bootstrap_trains_both_nets():
    G = TriPlaneGenerator(tiny_config())
    params = G.init(jax.random.PRNGKey(0))
    pose0 = resnet34_init(jax.random.PRNGKey(1), output_dims=4)
    vgg0 = vgg16_init(jax.random.PRNGKey(2), width_mult=0.125)
    pose, vgg, e4e, report = bootstrap_aux_nets(
        G, params, key=jax.random.PRNGKey(4), pose_params=pose0,
        vgg_params=vgg0, num_images=8, pose_steps=3, vgg_steps=3)
    # Same structure, changed values (both nets actually trained).
    jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: a.shape == b.shape, pose0, pose))
    changed_pose = any(
        not np.array_equal(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(pose0),
            jax.tree_util.tree_leaves(pose)))
    changed_vgg = any(
        not np.array_equal(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(vgg0),
            jax.tree_util.tree_leaves(vgg)))
    assert changed_pose and changed_vgg
    assert np.isfinite(report["pose_val_loss"])
    assert np.isfinite(report["pose_val_rot_deg"])
    # Trained nets still drive the consumers; the e4e substitute emits
    # a per-image w delta (projector adds it to mean-w).
    img = jnp.asarray(np.random.RandomState(0).uniform(
        0, 255, (1, 3, 64, 64)).astype(np.float32))
    assert np.all(np.isfinite(resnet34_apply(pose, img)))
    assert np.all(np.isfinite(_vgg_embed(vgg, img)))
    delta = e4e(img)
    assert delta.shape == (1, G.cfg.w_dim)
    assert np.all(np.isfinite(delta))


def test_vgg_bootstrap_reduces_loss():
    """With enough steps on a tiny problem the joint pose+latent loss
    must drop — the learning signal is real, not just parameter noise."""
    G = TriPlaneGenerator(tiny_config())
    params = G.init(jax.random.PRNGKey(0))
    ds = make_pseudo_dataset(G, params, jax.random.PRNGKey(5),
                             num_images=16, batch=8)
    vgg0 = vgg16_init(jax.random.PRNGKey(2), width_mult=0.125)
    logs = []
    train_vgg_bootstrap(vgg0, ds, steps=40, batch=8, lr=3e-4, chunk=5,
                        key=jax.random.PRNGKey(6), log_every=5,
                        log=logs.append)
    first = float(logs[0].split("loss ")[1].split(" ")[0])
    last = float(logs[-1].split("loss ")[1].split(" ")[0])
    assert last < first
