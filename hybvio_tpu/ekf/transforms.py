"""Rigid state re-anchoring and state surgery ops
(reference: src/odometry/ekf.cpp:296-317, 686-758, 928-947)."""
from __future__ import annotations

import jax.numpy as jnp

from ..geometry.quaternion import (
    quat_conj, quat_from_two_vectors, quat_mul, quat_right_mul_matrix, quat_to_rmat,
)
from .state import BGA, CAM, ORI, POS, POSE_DIM, VEL, EKFState
from .update import pdot


def initialize_orientation(s: EKFState, xa, noise_initial_ori, noise_scale,
                           sqrt_mode: bool = False) -> EKFState:
    """Set orientation from first accelerometer sample
    (reference: ekf.cpp:297-317). Heading variance pinned to zero.

    sqrt_mode: P holds the factor W. Zeroing the ORI rows of W zeroes the ORI
    rows+columns of P = W W^T (the reference overwrites only the diagonal
    block, but at initialization time the ORI cross-covariances are zero, so
    the two are equal where this is called)."""
    dtype = s.m.dtype
    gravity_up = jnp.asarray([0.0, 0.0, 1.0], dtype=dtype)  # -gravity direction
    q = quat_from_two_vectors(gravity_up, xa)
    m = s.m.at[ORI : ORI + 4].set(q)
    block_var = jnp.asarray([1.0, 1.0, 1.0, 0.0], dtype=dtype) * (
        noise_initial_ori**2 * noise_scale)
    if sqrt_mode:
        W = s.P.at[ORI : ORI + 4, :].set(0.0)
        for i in range(4):
            W = W.at[ORI + i, ORI + i].set(jnp.sqrt(block_var[i]))
        return s._replace(m=m, P=W)
    P = s.P.at[ORI : ORI + 4, ORI : ORI + 4].set(jnp.diag(block_var))
    return s._replace(m=m, P=P)


def translate_to(s: EKFState, pos, cam_pose_count: int) -> EKFState:
    """Translate current + trail positions so current position == pos
    (reference: ekf.cpp:686-702)."""
    delta = pos - s.m[POS : POS + 3]
    m = s.m.at[POS : POS + 3].add(delta)
    for i in range(cam_pose_count):
        off = CAM + POSE_DIM * i
        m = m.at[off : off + 3].add(delta)
    return s._replace(m=m)


def transform_to(s: EKFState, pos, q, cam_pose_count: int, pose_index: int = -1,
                 sqrt_mode: bool = False) -> EKFState:
    """Rigidly rotate+translate the whole state (incl. covariance) so pose
    `pose_index` (-1 = current) equals (pos, q) (reference: ekf.cpp:704-758).

    sqrt_mode: P holds the factor W; A P A^T == (A W)(A W)^T."""
    dtype = s.m.dtype
    d = s.m.shape[0]
    if pose_index < 0:
        q0 = s.m[ORI : ORI + 4]
        p0 = s.m[POS : POS + 3]
    else:
        off = CAM + POSE_DIM * pose_index
        p0 = s.m[off : off + 3]
        q0 = s.m[off + 3 : off + 7]
    q_change = quat_mul(quat_conj(q0), q)
    q_change_mat = quat_right_mul_matrix(q_change)
    p_change_mat = quat_to_rmat(q_change).T

    A = jnp.eye(d, dtype=dtype)
    A = A.at[POS : POS + 3, POS : POS + 3].set(p_change_mat)
    A = A.at[VEL : VEL + 3, VEL : VEL + 3].set(p_change_mat)
    A = A.at[ORI : ORI + 4, ORI : ORI + 4].set(q_change_mat)
    for i in range(cam_pose_count):
        off = CAM + POSE_DIM * i
        A = A.at[off : off + 3, off : off + 3].set(p_change_mat)
        A = A.at[off + 3 : off + 7, off + 3 : off + 7].set(q_change_mat)

    m = pdot(A, s.m[:, None])[:, 0]
    P = pdot(A, s.P) if sqrt_mode else pdot(pdot(A, s.P), A.T)
    s = s._replace(m=m, P=P)
    ref_pos = p_change_mat @ p0
    translation = pos - ref_pos
    return translate_to(s, s.m[POS : POS + 3] + translation, cam_pose_count)


def condition_on_last_pose(s: EKFState, cam_pose_count: int,
                           sqrt_mode: bool = False) -> EKFState:
    """Schur-condition the state on the last trail pose, then reset its
    covariance (reference: ekf.cpp:928-942).

    sqrt_mode: rare host-triggered state surgery — reconstruct P, apply the
    Schur complement, re-factor via (symmetric-eigendecomposition) square
    root. Not a hot-path op."""
    d = s.m.shape[0]
    dtype = s.m.dtype
    k = d - POSE_DIM
    P = pdot(s.P, s.P.T) if sqrt_mode else s.P
    A = P[:k, :k]
    B = P[:k, k:]
    C = P[k:, k:]
    Pnew = A - B @ jnp.linalg.solve(C, B.T)
    P = jnp.zeros_like(P).at[:k, :k].set(Pnew)
    NOISE = 1e3
    P = P.at[k:, k:].set(jnp.eye(POSE_DIM, dtype=dtype) * NOISE * NOISE)
    if sqrt_mode:
        lam, V = jnp.linalg.eigh(0.5 * (P + P.T))
        W = V * jnp.sqrt(jnp.maximum(lam, 0.0))[None, :]
        return s._replace(P=W)
    return s._replace(P=P)


def lock_biases(s: EKFState, sqrt_mode: bool = False) -> EKFState:
    """Zero all covariance involving BGA/BAA/BAT (reference: ekf.cpp:944-947)."""
    P = s.P.at[BGA : BGA + 9, :].set(0.0)
    if not sqrt_mode:
        # in sqrt mode zeroing the factor ROWS already zeroes P rows+columns
        P = P.at[:, BGA : BGA + 9].set(0.0)
    return s._replace(P=P)


def insert_map_point(s: EKFState, offset: jnp.ndarray, pf,
                     sqrt_mode: bool = False) -> EKFState:
    """Insert hybrid map point at state offset (reference: ekf.cpp:905-921)."""
    d = s.m.shape[0]
    dtype = s.m.dtype
    idx = jnp.arange(d)
    in_block = (idx >= offset) & (idx < offset + 3)
    keep = (~in_block).astype(dtype)
    NOISE = 1e3
    if sqrt_mode:
        from .sqrt import sr_add_diag_noise

        W = s.P * keep[:, None]  # zero factor rows => zero P rows+cols
        P = sr_add_diag_noise(
            W, jnp.where(in_block, NOISE * NOISE, 0.0).astype(dtype))
    else:
        P = s.P * (keep[:, None] * keep[None, :])
        P = P + jnp.diag(jnp.where(in_block, NOISE * NOISE, 0.0).astype(dtype))
    m = jnp.where(in_block, jnp.zeros_like(s.m), s.m)
    m = m.at[offset].set(pf[0]).at[offset + 1].set(pf[1]).at[offset + 2].set(pf[2])
    return s._replace(m=m, P=P)
