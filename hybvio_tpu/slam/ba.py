"""Bundle adjustment: batched Gauss-Newton with Schur complement, TPU-native.

The reference SLAM module runs g2o-style local BA over ~20 keyframes with
odometry relative-pose priors (reference: parameter surface
slam.localBAProblemSize / odometryPriorStrength*, parameter_definitions.c:
389-422; module source not in snapshot). This redesign expresses the problem
as fixed-shape arrays:

  poses:   (NK, 7)  keyframe camera-to-world [pos(3), quat(4) wxyz]
  points:  (MP, 3)  map points (world)
  obs:     (NK, MP) observation mask + (NK, MP, 2) normalized image points

Each GN iteration builds the full reprojection Jacobian blocks analytically
via autodiff (vmapped per observation), reduces them into the camera system
with the point (3x3) blocks eliminated by Schur complement, solves the
reduced (NK*6) system (first pose gauge-fixed), and back-substitutes points.
All shapes static; masked observations contribute zero.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.quaternion import quat_mul, quat_normalize, quat_to_rmat

POSE_DOF = 6  # se3 delta: [translation(3), rotation(3)]


def _apply_pose_delta(pose, delta):
    """pose (7,) [p, q(wxyz)] with local delta [dt(3), dw(3)] (right-ish
    perturbation: q' = q * exp(dw), p' = p + dt)."""
    p = pose[:3] + delta[:3]
    dw = delta[3:]
    angle2 = jnp.sum(dw * dw)
    # small-angle quaternion exp
    half = 0.5
    w = 1.0 - angle2 / 8.0
    xyz = dw * (half - angle2 / 48.0)
    dq = jnp.concatenate([w[None], xyz])
    q = quat_normalize(quat_mul(pose[3:], dq))
    return jnp.concatenate([p, q])


def _project(pose, point):
    """Normalized-plane projection of world point from camera-to-world pose."""
    q = pose[3:]
    Rcw = quat_to_rmat(q)  # here: camera-to-world rotation
    pc = Rcw.T @ (point - pose[:3])
    z = pc[2]
    safe = jnp.where(jnp.abs(z) > 1e-9, z, 1.0)
    return pc[:2] / safe, z


def _residual(pose, point, ip):
    proj, z = _project(pose, point)
    return proj - ip, z


class BAProblem(NamedTuple):
    poses: jnp.ndarray  # (NK, 7) camera-to-world
    points: jnp.ndarray  # (MP, 3)
    obs_ip: jnp.ndarray  # (NK, MP, 2) normalized image points
    obs_mask: jnp.ndarray  # (NK, MP) bool
    pose_valid: jnp.ndarray  # (NK,) bool
    point_valid: jnp.ndarray  # (MP,) bool
    # odometry relative-pose priors between consecutive keyframes
    # (reference: odometryPriorStrengthPosition/Rotation)
    prior_rel: jnp.ndarray  # (NK-1, 7) measured relative pose k -> k+1 (cam-to-cam)
    prior_mask: jnp.ndarray  # (NK-1,) bool
    prior_w_pos: jnp.ndarray  # () weight
    prior_w_rot: jnp.ndarray  # ()


def _relative_pose(pose_a, pose_b):
    """Relative pose a->b in a's frame: (Ra^T (pb - pa), qa^-1 * qb)."""
    qa = pose_a[3:]
    Ra = quat_to_rmat(qa)
    dp = Ra.T @ (pose_b[:3] - pose_a[:3])
    qab = quat_mul(qa * jnp.asarray([1.0, -1, -1, -1], qa.dtype), pose_b[3:])
    return jnp.concatenate([dp, qab])


def _prior_residual(pose_a, pose_b, rel_meas, w_pos, w_rot):
    rel = _relative_pose(pose_a, pose_b)
    dp = (rel[:3] - rel_meas[:3]) * w_pos
    # quaternion difference (vector part of q_meas^-1 * q)
    qd = quat_mul(rel_meas[3:] * jnp.asarray([1.0, -1, -1, -1], rel.dtype), rel[3:])
    dr = qd[1:] * jnp.sign(qd[0]) * 2.0 * w_rot
    return jnp.concatenate([dp, dr])  # (6,)


def ba_iterate(problem: BAProblem, iterations: int = 10, damping: float = 1e-4,
               huber_delta: float = 0.01, fix_first_pose: bool = True,
               axis_name: str = None):
    """Run GN iterations; returns (poses, points, final_cost).

    Gauge: the first valid pose is held fixed (the odometry priors otherwise
    leave a global 6-DOF + scale-ish gauge freedom in mono).

    axis_name: when set, the MAP-POINT axis of the problem is assumed
    sharded over that mesh axis (shard_map caller) and every reduction over
    points becomes a psum collective; poses/priors are replicated and the
    small Schur solve runs redundantly on every device. This is the
    multi-chip BA scaling path (see make_sharded_ba) — map points carry the
    FLOPs (per-observation Jacobians, V inversions, W V^-1 W^T outer
    products) while the pose-side state is tiny.
    """
    NK = problem.poses.shape[0]
    MP = problem.points.shape[0]
    dtype = problem.poses.dtype

    def _allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    obs_w = problem.obs_mask & problem.pose_valid[:, None] & problem.point_valid[None, :]

    def one_iteration(carry, _):
        poses, points = carry

        # --- per-observation residuals & Jacobians (vmapped) ---
        def obs_jac(k, j):
            def f(x):
                dpose = x[:6]
                dpoint = x[6:]
                pose = _apply_pose_delta(poses[k], dpose)
                r, z = _residual(pose, points[j] + dpoint, problem.obs_ip[k, j])
                return r

            x0 = jnp.zeros(9, dtype)
            r0, z = _residual(poses[k], points[j], problem.obs_ip[k, j])
            J = jax.jacfwd(f)(x0)  # (2, 9)
            # Huber weights + behind-camera rejection
            rn = jnp.linalg.norm(r0)
            w = jnp.sqrt(jnp.where(rn > huber_delta, huber_delta / jnp.maximum(rn, 1e-12), 1.0))
            w = jnp.where(z > 0.01, w, 0.0)
            return r0 * w, J * w

        ks, js = jnp.meshgrid(jnp.arange(NK), jnp.arange(MP), indexing="ij")
        r_all, J_all = jax.vmap(jax.vmap(obs_jac))(ks, js)  # (NK,MP,2), (NK,MP,2,9)
        wmask = obs_w.astype(dtype)[..., None]
        r_all = r_all * wmask
        J_all = J_all * wmask[..., None]

        Jc = J_all[..., :6]  # (NK,MP,2,6) camera blocks
        Jp = J_all[..., 6:]  # (NK,MP,2,3) point blocks

        # normal equation blocks; U/bc reduce over the (possibly sharded)
        # point axis -> collective; V/W/bp stay per-point (local to shard)
        U = _allsum(jnp.einsum("kmri,kmrj->kij", Jc, Jc))  # (NK,6,6)
        V = jnp.einsum("kmri,kmrj->mij", Jp, Jp)  # (MP,3,3)
        Wkm = jnp.einsum("kmri,kmrj->kmij", Jc, Jp)  # (NK,MP,6,3)
        bc = -_allsum(jnp.einsum("kmri,kmr->ki", Jc, r_all))  # (NK,6)
        bp = -jnp.einsum("kmri,kmr->mi", Jp, r_all)  # (MP,3)

        # --- odometry relative-pose priors between consecutive keyframes ---
        def prior_jac(k):
            def f(x):
                pa = _apply_pose_delta(poses[k], x[:6])
                pb = _apply_pose_delta(poses[k + 1], x[6:])
                return _prior_residual(pa, pb, problem.prior_rel[k],
                                       problem.prior_w_pos, problem.prior_w_rot)

            x0 = jnp.zeros(12, dtype)
            r0 = _prior_residual(poses[k], poses[k + 1], problem.prior_rel[k],
                                 problem.prior_w_pos, problem.prior_w_rot)
            J = jax.jacfwd(f)(x0)  # (6, 12)
            m = problem.prior_mask[k].astype(dtype)
            return r0 * m, J * m

        rp, Jp2 = jax.vmap(prior_jac)(jnp.arange(NK - 1))  # (NK-1,6), (NK-1,6,12)
        Ja = Jp2[..., :6]
        Jb = Jp2[..., 6:]
        U = U.at[:-1].add(jnp.einsum("kri,krj->kij", Ja, Ja))
        U = U.at[1:].add(jnp.einsum("kri,krj->kij", Jb, Jb))
        W_prior = jnp.einsum("kri,krj->kij", Ja, Jb)  # coupling k,k+1 (6,6)
        bc = bc.at[:-1].add(-jnp.einsum("kri,kr->ki", Ja, rp))
        bc = bc.at[1:].add(-jnp.einsum("kri,kr->ki", Jb, rp))

        # damping
        U = U + damping * jnp.eye(6, dtype=dtype)[None]
        V = V + damping * jnp.eye(3, dtype=dtype)[None]

        # --- Schur complement: eliminate points (point-axis reductions are
        # collectives under sharding) ---
        Vinv = jnp.linalg.inv(V)  # (MP,3,3); damped, invertible
        WVinv = jnp.einsum("kmij,mjl->kmil", Wkm, Vinv)  # (NK,MP,6,3)
        # S = U - sum_m W Vinv W^T  (dense (NK*6, NK*6) incl. prior coupling)
        S_full = -_allsum(jnp.einsum("kmil,qmjl->kqij", WVinv, Wkm))
        S_full = S_full.at[jnp.arange(NK), jnp.arange(NK)].add(U)
        S_full = S_full.at[jnp.arange(NK - 1), jnp.arange(1, NK)].add(W_prior)
        S_full = S_full.at[jnp.arange(1, NK), jnp.arange(NK - 1)].add(
            jnp.swapaxes(W_prior, -1, -2))
        b_red = bc - _allsum(jnp.einsum("kmil,ml->ki", WVinv, bp))  # (NK,6)

        S = jnp.transpose(S_full, (0, 2, 1, 3)).reshape(NK * 6, NK * 6)
        b = b_red.reshape(NK * 6)

        # gauge fixing + invalid poses: pin their deltas to zero
        pin = ~problem.pose_valid
        if fix_first_pose:
            first = jnp.argmax(problem.pose_valid)
            pin = pin.at[first].set(True)
        pin6 = jnp.repeat(pin, 6)
        S = jnp.where(pin6[:, None] | pin6[None, :], 0.0, S)
        S = S + jnp.diag(jnp.where(pin6, 1.0, 0.0))
        b = jnp.where(pin6, 0.0, b)

        dc = jnp.linalg.solve(S + 1e-12 * jnp.eye(NK * 6, dtype=dtype), b).reshape(NK, 6)
        dp_pts = jnp.einsum("mij,mj->mi", Vinv, bp - jnp.einsum("kmij,ki->mj", Wkm, dc))

        new_poses = jax.vmap(_apply_pose_delta)(poses, dc)
        new_points = points + dp_pts * problem.point_valid[:, None].astype(dtype)
        return (new_poses, new_points), _allsum(jnp.sum(r_all * r_all))

    (poses, points), costs = jax.lax.scan(
        one_iteration, (problem.poses, problem.points), None, length=iterations)
    return poses, points, costs[-1]


def make_sharded_ba(mesh, iterations: int = 10, damping: float = 1e-4,
                    huber_delta: float = 0.01, fix_first_pose: bool = True,
                    axis: str = "data"):
    """Multi-chip bundle adjustment: the BAProblem's MAP-POINT axis shards
    over the mesh; per-point Jacobians / V inversions / Schur outer products
    run device-local and the pose-side normal equations reduce with psum
    over ICI. Poses and the (NK*6)^2 Schur solve are replicated (tiny).

    Returns sharded_ba(problem) -> (poses, points, cost) where the problem's
    points / obs_ip / obs_mask / point_valid leading point dimension must be
    divisible by the mesh axis size. This is the designed scaling path for
    large maps (SURVEY §2: VIO itself admits only data parallelism; global
    map refinement is the one cross-device-FLOPs component)."""
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    specs = BAProblem(
        poses=P(), points=P(axis), obs_ip=P(None, axis), obs_mask=P(None, axis),
        pose_valid=P(), point_valid=P(axis), prior_rel=P(), prior_mask=P(),
        prior_w_pos=P(), prior_w_rot=P())
    fn = partial(ba_iterate, iterations=iterations, damping=damping,
                 huber_delta=huber_delta, fix_first_pose=fix_first_pose,
                 axis_name=axis)
    return jax.jit(shard_map(fn, mesh=mesh, in_specs=(specs,),
                             out_specs=(P(), P(axis), P()),
                             check_rep=False))


def triangulate_points_linear(poses, obs_ip, obs_mask):
    """Linear multi-view triangulation of all map points from keyframe
    observations (initialization for BA). poses: (NK,7) cam-to-world."""
    dtype = poses.dtype
    q = poses[:, 3:]
    Rcw = quat_to_rmat(q)  # (NK,3,3) cam-to-world
    # world ray of each observation
    v = jnp.concatenate([obs_ip, jnp.ones_like(obs_ip[..., :1])], axis=-1)  # (NK,MP,3)
    vw = jnp.einsum("kij,kmj->kmi", Rcw, v)
    vn = vw / jnp.linalg.norm(vw, axis=-1, keepdims=True)
    A = jnp.eye(3, dtype=dtype)[None, None] - vn[..., :, None] * vn[..., None, :]
    A = A * obs_mask.astype(dtype)[..., None, None]
    S0 = jnp.sum(A, axis=0)  # (MP,3,3)
    S1 = jnp.einsum("kmij,kj->mi", A, poses[:, :3])
    pts = jnp.linalg.solve(
        S0 + 1e-9 * jnp.eye(3, dtype=dtype)[None], S1[..., None]).squeeze(-1)
    ok = jnp.sum(obs_mask, axis=0) >= 2
    return pts, ok
