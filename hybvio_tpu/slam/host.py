"""Host-CPU execution layer for the SLAM module's keyframe-rate math.

The VIO hot path is frame-rate and image-shaped: it belongs on the TPU. The
SLAM module is keyframe-rate and tiny-shaped (dozens of poses, hundreds of
descriptors), and every one of its device calls costs a host<->device round
trip — over a remote-TPU tunnel ~30 ms EACH — so a keyframe's worth of
descriptor extraction + candidate matching + BA paid seconds of wall clock
while using microseconds of compute. The reference runs the whole SLAM
module on a dedicated CPU thread (reference: slam.slamThread,
codegen/parameter_definitions.c:367; std::future handoff,
src/odometry/backend.cpp:140,507-518); this layer is the TPU-native
equivalent: the SAME JAX programs (slam/ba.py, slam/posegraph.py,
slam/orb.py, slam/loopclosure.py) compiled for jax's always-available host
CPU backend, plus plain-numpy pose/quaternion helpers for the scalar
bookkeeping between them. Multi-chip BA (Slam.set_ba_mesh) still places the
map-point-sharded solve on the accelerator mesh — the one SLAM computation
with enough FLOPs to earn the transfer (slam/ba.py make_sharded_ba).
"""
from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=1)
def cpu_device():
    import jax

    return jax.devices("cpu")[0]


def host_jit(fn, static_argnums=()):
    """jax.jit `fn` for the host CPU backend.

    The returned callable converts committed device arrays in its arguments
    to host numpy (a no-op for numpy inputs, which is what SLAM passes) and
    executes under the cpu default device, so the program compiles for and
    runs on the host — no accelerator round trip. Outputs are CPU-backed jax
    arrays; np.asarray on them is free.
    """
    import jax

    static = set(static_argnums)
    jitted = jax.jit(fn, static_argnums=static_argnums)

    def call(*args):
        conv = tuple(
            a if i in static else jax.tree_util.tree_map(
                lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, a)
            for i, a in enumerate(args))
        with jax.default_device(cpu_device()):
            return jitted(*conv)

    return call


# ---------------------------------------------------------------- numpy math
# Plain-numpy twins of geometry/quaternion.py for the SLAM module's scalar
# bookkeeping (pose conversions between jitted programs). Same conventions:
# wxyz Hamilton quaternions, branch-free Shepperd rmat->quat.

def np_quat_to_rmat(q):
    w, x, y, z = q[0], q[1], q[2], q[3]
    return np.array([
        [w*w + x*x - y*y - z*z, 2*(x*y - w*z), 2*(x*z + w*y)],
        [2*(x*y + w*z), w*w - x*x + y*y - z*z, 2*(y*z - w*x)],
        [2*(x*z - w*y), 2*(y*z + w*x), w*w - x*x - y*y + z*z],
    ])


def np_rmat_to_quat(R):
    m = np.asarray(R)
    tr = m[0, 0] + m[1, 1] + m[2, 2]
    qw = np.sqrt(max(1 + tr, 0.0)) / 2
    qx = np.sqrt(max(1 + m[0, 0] - m[1, 1] - m[2, 2], 0.0)) / 2
    qy = np.sqrt(max(1 - m[0, 0] + m[1, 1] - m[2, 2], 0.0)) / 2
    qz = np.sqrt(max(1 - m[0, 0] - m[1, 1] + m[2, 2], 0.0)) / 2
    qx = -qx if m[2, 1] - m[1, 2] < 0 else qx
    qy = -qy if m[0, 2] - m[2, 0] < 0 else qy
    qz = -qz if m[1, 0] - m[0, 1] < 0 else qz
    q = np.array([qw, qx, qy, qz])
    return q / np.linalg.norm(q)


def np_quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw*bw - ax*bx - ay*by - az*bz,
        aw*bx + ax*bw + ay*bz - az*by,
        aw*by - ax*bz + ay*bw + az*bx,
        aw*bz + ax*by - ay*bx + az*bw,
    ])


def np_pose_to_mat(pose7):
    """[p, q(wxyz)] camera-to-world -> 4x4 camera-to-world matrix."""
    T = np.eye(4)
    T[:3, :3] = np_quat_to_rmat(np.asarray(pose7)[3:])
    T[:3, 3] = np.asarray(pose7)[:3]
    return T


def np_mat_to_pose(T):
    T = np.asarray(T)
    return np.concatenate([T[:3, 3], np_rmat_to_quat(T[:3, :3])])


def np_relative_pose(pose_a, pose_b):
    """Relative pose a->b in a's frame (numpy twin of slam/ba._relative_pose)."""
    pose_a = np.asarray(pose_a, np.float64)
    pose_b = np.asarray(pose_b, np.float64)
    qa = pose_a[3:]
    Ra = np_quat_to_rmat(qa)
    dp = Ra.T @ (pose_b[:3] - pose_a[:3])
    qab = np_quat_mul(qa * np.array([1.0, -1, -1, -1]), pose_b[3:])
    return np.concatenate([dp, qab])
