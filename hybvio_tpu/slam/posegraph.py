"""Pose-graph optimization over ALL keyframes, TPU-native.

The reference runs a global adjustment after accepted loop closures
(reference: slam.globalBAAfterLoop / globalBAIterations,
codegen/parameter_definitions.c:475-476; module source not in snapshot;
OpenVSLAM lineage = pose-graph + global BA, parameter_definitions.c:393-395).

Redesign: keyframe poses only (map points are corrected afterwards through
their anchor keyframe, like OpenVSLAM/ORB-SLAM), expressed as one fixed-shape
Gauss-Newton problem: N padded poses, E padded relative-pose edges
(consecutive odometry constraints + loop-closure constraints). Each iteration
builds the full edge Jacobian via autodiff (vmapped per edge), assembles the
dense (6N, 6N) normal equations with scatter-adds, and solves with the first
pose gauge-fixed. N is padded to the next power of two so recompiles are
O(log N) over a session's lifetime.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .ba import _apply_pose_delta, _prior_residual


class PoseGraphProblem(NamedTuple):
    poses: jnp.ndarray       # (N, 7) camera-to-world [p, q(wxyz)]
    pose_valid: jnp.ndarray  # (N,) bool
    edge_i: jnp.ndarray      # (E,) int32 source pose index
    edge_j: jnp.ndarray      # (E,) int32 target pose index
    edge_rel: jnp.ndarray    # (E, 7) measured relative pose i->j (in i's frame)
    edge_w_pos: jnp.ndarray  # (E,) position weight (0 = padded edge)
    edge_w_rot: jnp.ndarray  # (E,) rotation weight


def optimize_pose_graph(problem: PoseGraphProblem, iterations: int = 10,
                        damping: float = 1e-6) -> jnp.ndarray:
    """GN over the pose graph; returns optimized (N, 7) poses.

    Gauge: the first valid pose is held fixed (loop edges otherwise leave a
    global 6-DOF freedom).
    """
    N = problem.poses.shape[0]
    E = problem.edge_i.shape[0]
    dtype = problem.poses.dtype

    def one_iteration(poses, _):
        def edge_jac(e):
            i, j = problem.edge_i[e], problem.edge_j[e]

            def f(x):
                pa = _apply_pose_delta(poses[i], x[:6])
                pb = _apply_pose_delta(poses[j], x[6:])
                return _prior_residual(pa, pb, problem.edge_rel[e],
                                       problem.edge_w_pos[e],
                                       problem.edge_w_rot[e])

            x0 = jnp.zeros(12, dtype)
            r0 = _prior_residual(poses[i], poses[j], problem.edge_rel[e],
                                 problem.edge_w_pos[e], problem.edge_w_rot[e])
            J = jax.jacfwd(f)(x0)  # (6, 12)
            return r0, J

        r, J = jax.vmap(edge_jac)(jnp.arange(E))  # (E,6), (E,6,12)
        Ja, Jb = J[..., :6], J[..., 6:]

        # assemble dense normal equations with scatter-adds
        H = jnp.zeros((N, N, 6, 6), dtype)
        b = jnp.zeros((N, 6), dtype)
        ii, jj = problem.edge_i, problem.edge_j
        H = H.at[ii, ii].add(jnp.einsum("eri,erj->eij", Ja, Ja))
        H = H.at[jj, jj].add(jnp.einsum("eri,erj->eij", Jb, Jb))
        H = H.at[ii, jj].add(jnp.einsum("eri,erj->eij", Ja, Jb))
        H = H.at[jj, ii].add(jnp.einsum("eri,erj->eij", Jb, Ja))
        b = b.at[ii].add(-jnp.einsum("eri,er->ei", Ja, r))
        b = b.at[jj].add(-jnp.einsum("eri,er->ei", Jb, r))

        Hf = jnp.transpose(H, (0, 2, 1, 3)).reshape(N * 6, N * 6)
        bf = b.reshape(N * 6)

        # pin invalid poses + the first valid pose (gauge)
        pin = ~problem.pose_valid
        pin = pin.at[jnp.argmax(problem.pose_valid)].set(True)
        pin6 = jnp.repeat(pin, 6)
        Hf = jnp.where(pin6[:, None] | pin6[None, :], 0.0, Hf)
        Hf = Hf + jnp.diag(jnp.where(pin6, 1.0, damping))
        bf = jnp.where(pin6, 0.0, bf)

        d = jnp.linalg.solve(Hf + damping * jnp.eye(N * 6, dtype=dtype), bf)
        new_poses = jax.vmap(_apply_pose_delta)(poses, d.reshape(N, 6))
        return new_poses, jnp.sum(r * r)

    poses, costs = jax.lax.scan(
        one_iteration, problem.poses, None, length=iterations)
    return poses


def next_pow2(n: int, lo: int = 8) -> int:
    p = lo
    while p < n:
        p *= 2
    return p
