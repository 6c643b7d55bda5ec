"""Quaternion / rotation utilities (wxyz convention, Hamilton).

TPU-native port of the reference quaternion math (reference:
src/odometry/util.cpp:9-54). All functions are pure jnp, shape-polymorphic in
leading batch dimensions, and differentiable — the reference's hand-derived
``quat2rmat_d`` is replaced by ``jax.jacfwd`` at call sites that need it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_to_rmat(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix from (possibly unnormalized) quaternion [w,x,y,z].

    Matches Matlab Robotics toolbox quat2rotm and the reference quat2rmat
    (reference: src/odometry/util.cpp:10-26); note this formula is quadratic in
    q and NOT norm-invariant, matching the reference exactly (the EKF relies on
    its polynomial form for well-behaved derivatives).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z,
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [w,x,y,z] from rotation matrix; w >= 0 branch-free Shepperd."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate computations, pick numerically best by largest pivot
    qw = jnp.sqrt(jnp.maximum(1 + tr, 0.0)) / 2
    qx = jnp.sqrt(jnp.maximum(1 + m00 - m11 - m22, 0.0)) / 2
    qy = jnp.sqrt(jnp.maximum(1 - m00 + m11 - m22, 0.0)) / 2
    qz = jnp.sqrt(jnp.maximum(1 - m00 - m11 + m22, 0.0)) / 2
    # sign transfer without copysign (copysign lowers to s64 bitcasts that some
    # backends reject); sign(0) = 0 is fine here since then the component is 0.
    qx = qx * jnp.where(m21 - m12 < 0, -1.0, 1.0)
    qy = qy * jnp.where(m02 - m20 < 0, -1.0, 1.0)
    qz = qz * jnp.where(m10 - m01 < 0, -1.0, 1.0)
    q = jnp.stack([qw, qx, qy, qz], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Normalize; an all-zero quaternion stays all-zero (reference
    normalizeQuaternions tolerates zero trail slots, ekf.cpp:1024-1032)."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(n > eps, q / jnp.where(n > 0, n, 1.0), q)


def quat_from_two_vectors(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Quaternion rotating u onto v (Eigen Quaterniond::FromTwoVectors semantics).

    Used to initialize orientation from the first accelerometer sample
    (reference: src/odometry/ekf.cpp:297-317). For u = -gravity = +z axis the
    result has zero z component, fixing the arbitrary heading.
    """
    un = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    vn = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    c = jnp.sum(un * vn, axis=-1)
    axis = jnp.cross(un, vn)
    s2 = jnp.sum(axis * axis, axis=-1)
    # regular case: q = [sqrt((1+c)/2), axis/sqrt(2(1+c))]
    w = jnp.sqrt(jnp.maximum((1.0 + c) / 2.0, 0.0))
    xyz = axis / jnp.sqrt(jnp.maximum(2.0 * (1.0 + c), 1e-30))
    q = jnp.concatenate([w[..., None], xyz], axis=-1)
    # antipodal case (c ~ -1): rotate pi about any axis orthogonal to u
    ortho = jnp.where(
        jnp.abs(un[..., 0:1]) < 0.9,
        jnp.cross(un, jnp.array([1.0, 0.0, 0.0], dtype=u.dtype) * jnp.ones_like(un)),
        jnp.cross(un, jnp.array([0.0, 1.0, 0.0], dtype=u.dtype) * jnp.ones_like(un)),
    )
    ortho = ortho / jnp.linalg.norm(ortho, axis=-1, keepdims=True)
    q_pi = jnp.concatenate([jnp.zeros_like(c)[..., None], ortho], axis=-1)
    return jnp.where((c < -1.0 + 1e-9)[..., None], q_pi, q)


def gyro_update_matrix(w: jnp.ndarray, dt) -> jnp.ndarray:
    """A = expm(-dt/2 * S(w)): the 4x4 quaternion update for angular rate w.

    The reference computes a dense 4x4 matrix exponential (reference:
    src/odometry/ekf.cpp:404-425). Because S(w) satisfies S^2 = -|w|^2 I, the
    exponential has the closed form cos(|w| dt/2) I - sin(|w| dt/2)/|w| S(w),
    which is exact, cheaper, and avoids unsupported MatrixFunctions.
    """
    dtype = w.dtype
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    S = jnp.stack(
        [
            z, -wx, -wy, -wz,
            wx, z, -wz, wy,
            wy, wz, z, -wx,
            wz, -wy, wx, z,
        ],
        axis=-1,
    ).reshape(w.shape[:-1] + (4, 4))
    half = 0.5 * dt
    # sin(n*h)/n and cos(n*h) with series fallback near n = 0; the "safe norm"
    # double-where keeps jax gradients finite at w = 0 (sqrt'(0) = inf otherwise)
    nrm2 = jnp.sum(w * w, axis=-1)
    small = nrm2 < 1e-24
    nrm = jnp.sqrt(jnp.where(small, 1.0, nrm2))
    nh = nrm * half
    h2n2 = nrm2 * half * half
    sinc = jnp.where(small, half * (1.0 - h2n2 / 6.0), jnp.sin(nh) / nrm)
    cos = jnp.where(small, 1.0 - h2n2 / 2.0, jnp.cos(nh))
    eye = jnp.eye(4, dtype=dtype)
    return cos[..., None, None] * eye - sinc[..., None, None] * S


def quat_right_mul_matrix(p: jnp.ndarray) -> jnp.ndarray:
    """Matrix M such that M @ q == quat_mul(q, p) (right multiplication by p).

    Used by transformTo for rotating the whole pose trail (reference:
    src/odometry/ekf.cpp:704-758).
    """
    p1, p2, p3, p4 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    M = jnp.stack(
        [
            p1, -p2, -p3, -p4,
            p2, p1, p4, -p3,
            p3, -p4, p1, p2,
            p4, p3, -p2, p1,
        ],
        axis=-1,
    )
    return M.reshape(p.shape[:-1] + (4, 4))


def remove_z_tilt_rmat(R: jnp.ndarray) -> jnp.ndarray:
    """Extract the XY (yaw-only) rotation part of R (reference:
    src/odometry/util.cpp:76-101)."""
    rotated_x = R[..., :, 0]
    angle = jnp.arctan2(rotated_x[..., 1], rotated_x[..., 0])
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([c, -s, z, s, c, z, z, z, o], axis=-1).reshape(R.shape[:-2] + (3, 3))
