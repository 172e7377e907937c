"""Camera pose samplers and rotation parameterizations.

Behavioral parity target: utils/camera_utils.py (LookAtPoseSampler,
GaussianCameraPoseSampler, UniformCameraPoseSampler, create_cam2world,
FOV_to_intrinsics, quaternion/euler/6D rotation maps). All functions are
jit-compatible; samplers take explicit PRNG keys.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tgi.render.maths import normalize_vecs


def _cam_origin(h_mean, v_mean, radius, h=None, v=None):
    """Spherical camera location; (h, v) optional offsets from the means."""
    theta = h_mean if h is None else h
    phi = v_mean if v is None else v
    phi = jnp.clip(phi, 1e-5, math.pi - 1e-5)
    x = radius * jnp.sin(phi) * jnp.cos(math.pi - theta)
    z = radius * jnp.sin(phi) * jnp.sin(math.pi - theta)
    y = radius * jnp.cos(phi)
    return jnp.stack([jnp.asarray(x, jnp.float32),
                      jnp.asarray(y, jnp.float32),
                      jnp.asarray(z, jnp.float32)], axis=-1)


def create_cam2world_matrix(forward_vector, origin):
    """OpenCV-convention cam2world from a forward direction + origin
    (camera_utils.py:137-155)."""
    forward_vector = normalize_vecs(forward_vector)
    up_vector = jnp.broadcast_to(
        jnp.asarray([0, 1, 0], jnp.float32), forward_vector.shape)
    right_vector = -normalize_vecs(
        jnp.cross(up_vector, forward_vector, axis=-1))
    up_vector = normalize_vecs(
        jnp.cross(forward_vector, right_vector, axis=-1))

    rotation = jnp.stack([right_vector, up_vector, forward_vector], axis=-1)
    batch = forward_vector.shape[:-1]
    cam2world = jnp.zeros(batch + (4, 4), jnp.float32)
    cam2world = cam2world.at[..., :3, :3].set(rotation)
    cam2world = cam2world.at[..., :3, 3].set(origin)
    cam2world = cam2world.at[..., 3, 3].set(1.0)
    return cam2world


def look_at_pose(h, v, lookat_position, radius=1.0):
    """LookAtPoseSampler.sample with explicit angles (camera_utils.py:77-105).

    h, v: scalar or [N] camera yaw/pitch (radians, v in [0, pi]).
    lookat_position: [..., 3]. Returns [..., 4, 4] cam2world.
    """
    h = jnp.asarray(h, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    origin = _cam_origin(h, v, radius)
    forward = normalize_vecs(lookat_position - origin)
    return create_cam2world_matrix(forward, origin)


def gaussian_camera_pose(key, h_mean, v_mean, h_stddev=0., v_stddev=0.,
                         radius=1.0, batch_size=1):
    """GaussianCameraPoseSampler.sample (camera_utils.py:23-55)."""
    kh, kv = jax.random.split(key)
    h = jax.random.normal(kh, (batch_size, 1)) * h_stddev + h_mean
    v = jax.random.normal(kv, (batch_size, 1)) * v_stddev + v_mean
    origin = _cam_origin(None, None, radius, h=h[:, 0], v=v[:, 0])
    forward = normalize_vecs(-origin)
    return create_cam2world_matrix(forward, origin)


def uniform_camera_pose(key, h_mean, v_mean, h_stddev=0., v_stddev=0.,
                        radius=1.0, batch_size=1):
    """UniformCameraPoseSampler.sample (camera_utils.py:107-134)."""
    kh, kv = jax.random.split(key)
    h = ((jax.random.uniform(kh, (batch_size, 1)) * 2 - 1) * h_stddev + h_mean)
    v = ((jax.random.uniform(kv, (batch_size, 1)) * 2 - 1) * v_stddev + v_mean)
    origin = _cam_origin(None, None, radius, h=h[:, 0], v=v[:, 0])
    forward = normalize_vecs(-origin)
    return create_cam2world_matrix(forward, origin)


def fov_to_intrinsics(fov_degrees):
    """Normalized intrinsics from a field of view (camera_utils.py:190-198)."""
    focal = 1 / (2 * jnp.tan(jnp.deg2rad(jnp.asarray(fov_degrees)) / 2) + 1e-9)
    return jnp.asarray([[focal, 0., 0.5], [0., focal, 0.5], [0., 0., 1.]],
                       jnp.float32)


def pack_camera(cam2world, intrinsics):
    """25-dim conditioning vector: flat cam2world (16) + intrinsics (9)."""
    n = cam2world.shape[0]
    return jnp.concatenate([cam2world.reshape(n, 16),
                            jnp.broadcast_to(intrinsics.reshape(-1, 9),
                                             (n, 9))], axis=-1)


# ---------------------------------------------------------------------------
# Rotation parameterizations for the pose estimator (camera_utils.py:201-283)


def quaternion_to_rotmat(quat):
    """[N, 4] (w, x, y, z) -> [N, 3, 3]; normalizes input
    (camera_utils.py:201-228)."""
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
    B = quat.shape[0]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    mat = jnp.stack([
        w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
        2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
        2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
    ], axis=-1)
    return mat.reshape(B, 3, 3)


def euler_to_rotmat(theta, phi, radius=2.7):
    """Camera-on-sphere rotation from (yaw, pitch), as the reference's
    euler2rot builds it (camera_utils.py:241-257): place the camera at the
    spherical position, look at the origin; return the cam2world rotation.
    """
    theta = jnp.atleast_1d(jnp.asarray(theta, jnp.float32))
    phi = jnp.atleast_1d(jnp.asarray(phi, jnp.float32))
    origins = jnp.stack([
        radius * jnp.sin(phi) * jnp.cos(math.pi - theta),
        radius * jnp.cos(phi),
        radius * jnp.sin(phi) * jnp.sin(math.pi - theta)], axis=-1)
    forward = normalize_vecs(-origins)
    return create_cam2world_matrix(forward, origins)[:, :3, :3]


def rot6d_to_rotmat(x):
    """Zhou et al. 6D -> rotation matrix (camera_utils.py:259-273);
    keeps the reference's +1e-4 degeneracy guard."""
    x = x + 1e-4
    a1 = x[:, 0:3]
    a2 = x[:, 3:6]
    b1 = normalize_vecs(a1)
    b2 = normalize_vecs(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2, axis=-1)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(R):
    """Inverse map: first two columns flattened (camera_utils.py:275-283)."""
    return R[..., :2].swapaxes(-1, -2).reshape(R.shape[:-2] + (6,))
