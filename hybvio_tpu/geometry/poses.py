"""World/IMU/camera pose conversions (reference: src/odometry/util.{hpp,cpp}).

Conventions (identical to the reference):
  * EKF stores IMU pose: world position p (3,) and orientation quaternion q
    (4, wxyz) such that ``R = quat_to_rmat(q)`` maps WORLD -> IMU ("world to
    local" rotation).
  * ``imuToCamera`` is a 4x4 homogeneous matrix from IMU coords to camera coords.
  * worldToCamera = imuToCamera @ [R | -R p; 0 1]
"""
from __future__ import annotations

import jax.numpy as jnp

from .quaternion import quat_to_rmat, rmat_to_quat


def to_world_to_camera(p: jnp.ndarray, q: jnp.ndarray, imu_to_camera: jnp.ndarray) -> jnp.ndarray:
    """4x4 world-to-camera matrix from IMU pose (reference: util::toWorldToCamera)."""
    R = quat_to_rmat(q)
    T = jnp.zeros(p.shape[:-1] + (4, 4), dtype=p.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", R, p))
    T = T.at[..., 3, 3].set(1.0)
    return imu_to_camera @ T


def to_camera_to_world(p: jnp.ndarray, q: jnp.ndarray, imu_to_camera: jnp.ndarray) -> jnp.ndarray:
    """Inverse of to_world_to_camera computed in closed form."""
    R = quat_to_rmat(q)
    icr = imu_to_camera[..., :3, :3]
    ict = imu_to_camera[..., :3, 3]
    # worldToCamera = [icr R | icr(-R p) + ict]
    A = jnp.einsum("...ij,...jk->...ik", icr, R)
    b = -jnp.einsum("...ij,...j->...i", A, p) + ict
    T = jnp.zeros(p.shape[:-1] + (4, 4), dtype=p.dtype)
    T = T.at[..., :3, :3].set(jnp.swapaxes(A, -1, -2))
    T = T.at[..., :3, 3].set(-jnp.einsum("...ji,...j->...i", A, b))
    T = T.at[..., 3, 3].set(1.0)
    return T


def to_odometry_pose(world_to_camera: jnp.ndarray, imu_to_camera: jnp.ndarray):
    """world-to-camera matrix -> IMU position & orientation quaternion
    (reference: util::toOdometryPose)."""
    world_to_imu = jnp.linalg.solve(imu_to_camera, world_to_camera)
    R = world_to_imu[..., :3, :3]
    t = world_to_imu[..., :3, 3]
    p = -jnp.einsum("...ji,...j->...i", R, t)
    return p, rmat_to_quat(R)


def transform_vec3(mat4: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply homogeneous 4x4 to 3-vector(s) (reference: util::transformVec3ByMat4)."""
    return jnp.einsum("...ij,...j->...i", mat4[..., :3, :3], v) + mat4[..., :3, 3]


def vec2matrix(v) -> jnp.ndarray:
    """Flexible flat-vector -> homogeneous 4x4 (reference: util::vec2matrix).

    Accepts 3 (diagonal), 9 (rotation, column-major) or 16 (full, column-major)
    elements.
    """
    import numpy as np

    v = np.asarray(v, dtype=np.float64)
    m = np.eye(4)
    if v.size == 3:
        m[0, 0], m[1, 1], m[2, 2] = v
    elif v.size == 9:
        m[:3, :3] = v.reshape(3, 3).T  # column-major input
    elif v.size == 16:
        m = v.reshape(4, 4).T
    else:
        raise ValueError(f"invalid matrix vector size {v.size}")
    return jnp.asarray(m)
