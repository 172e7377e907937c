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


def rotmat_to_quat(R):
    """[N, 3, 3] -> [N, 4] unit quaternion (w, x, y, z); inverse of
    ``quaternion_to_rotmat`` up to sign (w >= 0 chosen).

    Branchless Shepperd: the four squared-component candidates
    ``1+tr``, ``1+m00-m11-m22``, ... sum to 4, so the argmax is always
    >= 1 and its square root is numerically safe.
    """
    R = jnp.asarray(R)
    m00, m01, m02 = R[:, 0, 0], R[:, 0, 1], R[:, 0, 2]
    m10, m11, m12 = R[:, 1, 0], R[:, 1, 1], R[:, 1, 2]
    m20, m21, m22 = R[:, 2, 0], R[:, 2, 1], R[:, 2, 2]
    cand = jnp.stack([1.0 + m00 + m11 + m22,        # 4w^2
                      1.0 + m00 - m11 - m22,        # 4x^2
                      1.0 - m00 + m11 - m22,        # 4y^2
                      1.0 - m00 - m11 + m22],       # 4z^2
                     axis=-1)
    s = 2.0 * jnp.sqrt(jnp.maximum(cand, 1e-12))    # [N, 4] = 4|q_i|
    q_w = jnp.stack([s[:, 0] / 4, (m21 - m12) / s[:, 0],
                     (m02 - m20) / s[:, 0], (m10 - m01) / s[:, 0]], -1)
    q_x = jnp.stack([(m21 - m12) / s[:, 1], s[:, 1] / 4,
                     (m01 + m10) / s[:, 1], (m02 + m20) / s[:, 1]], -1)
    q_y = jnp.stack([(m02 - m20) / s[:, 2], (m01 + m10) / s[:, 2],
                     s[:, 2] / 4, (m12 + m21) / s[:, 2]], -1)
    q_z = jnp.stack([(m10 - m01) / s[:, 3], (m02 + m20) / s[:, 3],
                     (m12 + m21) / s[:, 3], s[:, 3] / 4], -1)
    qs = jnp.stack([q_w, q_x, q_y, q_z], axis=1)    # [N, 4, 4]
    idx = jnp.argmax(cand, axis=-1)
    q = jnp.take_along_axis(qs, idx[:, None, None].repeat(4, -1),
                            axis=1)[:, 0]
    q = q * jnp.where(q[:, :1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def axis_angle_rotmat(axis, angle):
    """Rodrigues: unit ``axis`` [3], ``angle`` rad -> [3, 3]."""
    axis = jnp.asarray(axis, jnp.float32)
    axis = axis / jnp.linalg.norm(axis)
    kx, ky, kz = axis
    K = jnp.asarray([[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]],
                    jnp.float32)
    return (jnp.eye(3) + jnp.sin(angle) * K
            + (1.0 - jnp.cos(angle)) * (K @ K))


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
