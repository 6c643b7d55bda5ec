"""Pose-trail augmentation / undo (reference: src/odometry/ekf.cpp:229-296, 848-903).

The reference precomputes sparse permutation matrices visAugA[K] (one per
possible dropped pose index K) and applies:
  1. "prediction" m <- A m, P <- A P A^T + Qaug   (new head slot zeroed, big prior)
  2. KF "update trick" with H = visAugH enforcing head slot == current pose,
     measurement noise augmentR, Joseph-form covariance update.

The TPU redesign replaces the sparse matrices with a dynamically computed
gather-index vector (a function of the traced dropped index K), so one static
program handles all K values; A P A^T becomes a double gather + mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .state import CAM, MAP_POINT_DIM, ORI, POS, POSE_DIM, EKFState
from .update import normalize_quaternions
from .update import pdot


def _augment_gather_index(d: int, cam_pose_count: int, dropped: jnp.ndarray):
    """src index per state element for the augmentation permutation.

    new[i] = old[src[i]], except the new head pose slot which is zero-filled
    (mask=0). dropped is the dropped trail index K in [0, L-1].
    """
    idx = jnp.arange(d)
    trail_dim = POSE_DIM * cam_pose_count
    in_trail = (idx >= CAM) & (idx < CAM + trail_dim)
    slot = jnp.where(in_trail, (idx - CAM) // POSE_DIM, 0)
    src = jnp.where(in_trail & (slot >= 1) & (slot <= dropped), idx - POSE_DIM, idx)
    keep = ~(in_trail & (slot == 0))
    return src, keep


def augment_pose(s: EKFState, dropped_pose_index, params,
                 sqrt_mode: bool = False) -> EKFState:
    """Clone current pose into trail head, dropping trail pose K
    (reference: updateVisualPoseAugmentation, ekf.cpp:848-885).

    dropped_pose_index: traced int in [0, L-1]; pass L-1 for "drop last".
    sqrt_mode: state.P holds the factor W; the permutation gathers W rows
    (A P A^T == (A W)(A W)^T), Qaug joins as appended columns under one QR,
    and the update trick runs as a square-root update (ekf/sqrt.py).
    """
    po = params
    L = po.cameraTrailLength
    noise_scale = po.noiseScale * po.noiseScale
    dtype = s.m.dtype
    d = s.m.shape[0]
    K = jnp.asarray(dropped_pose_index, dtype=jnp.int32)

    src, keep = _augment_gather_index(d, L, K)
    keepf = keep.astype(dtype)
    m = s.m[src] * keepf

    # update trick: H (7 x d): rows enforce current pose - head slot == 0
    H = jnp.zeros((POSE_DIM, d), dtype=dtype)
    for i in range(3):
        H = H.at[i, POS + i].set(1.0)
        H = H.at[i, CAM + i].set(-1.0)
    for i in range(4):
        H = H.at[3 + i, ORI + i].set(1.0)
        H = H.at[3 + i, CAM + 3 + i].set(-1.0)

    r = po.augmentR * noise_scale
    pos_var = po.noiseInitialPosTrail**2 * noise_scale
    ori_var = po.noiseInitialOriTrail**2 * noise_scale

    if sqrt_mode:
        from .sqrt import qr_factor, sr_update

        W = s.P[src, :] * keepf[:, None]
        # Qaug columns: prior noise on the zeroed head slot (7 nonzeros)
        cols = jnp.zeros((d, POSE_DIM), dtype)
        for i in range(3):
            cols = cols.at[CAM + i, i].set(jnp.sqrt(pos_var))
        for i in range(4):
            cols = cols.at[CAM + 3 + i, 3 + i].set(jnp.sqrt(ori_var))
        W = qr_factor(jnp.concatenate([W, cols], axis=1))
        r_sqrt = jnp.full((POSE_DIM,), jnp.sqrt(r), dtype)
        m_new, W_new, _ = sr_update(m, W, -(H @ m), H, r_sqrt)
        ok = jnp.isfinite(m_new).all() & jnp.isfinite(W_new).all()
        m = jnp.where(ok, m_new, m)
        P = jnp.where(ok, W_new, W)
        m = normalize_quaternions(m, L)
    else:
        P = s.P[src][:, src] * (keepf[:, None] * keepf[None, :])

        # Qaug: prior noise on the (zeroed) head slot
        qdiag = jnp.zeros(d, dtype=dtype)
        qdiag = qdiag.at[CAM : CAM + 3].set(pos_var)
        qdiag = qdiag.at[CAM + 3 : CAM + POSE_DIM].set(ori_var)
        P = P + jnp.diag(qdiag)

        R = r * jnp.eye(POSE_DIM, dtype=dtype)
        HP = pdot(H, P)
        S = pdot(HP, H.T) + R
        from .update import solve_innovation

        Kg = solve_innovation(S, HP).T  # (d, 7)
        m_new = m + Kg @ (-(H @ m))

        # Joseph form (reference: updateCommonJosephForm, ekf.cpp:35-50)
        IKH = jnp.eye(d, dtype=dtype) - pdot(Kg, H)
        P_new = pdot(pdot(IKH, P), IKH.T) + pdot(pdot(Kg, R), Kg.T)
        # a degenerate S (f32 rounding pushed P indefinite) must not NaN the
        # filter: fall back to the permuted state with the Qaug prior (the clone
        # constraint is then enforced only softly by later updates)
        ok = jnp.isfinite(m_new).all() & jnp.isfinite(P_new).all()
        m = jnp.where(ok, m_new, m)
        P = jnp.where(ok, P_new, P)
        P = 0.5 * (P + P.T)
        m = normalize_quaternions(m, L)

    # pose timestamps follow the same trail permutation
    t_now = s.first_sample_t + s.time
    slots = jnp.arange(L)
    old_times = s.pose_times
    new_times = jnp.where(
        slots == 0,
        t_now,
        jnp.where(slots <= K, old_times[jnp.maximum(slots - 1, 0)], old_times),
    )
    augment_count = jnp.minimum(s.augment_count + 1, L)
    return s._replace(m=m, P=P, pose_times=new_times, augment_count=augment_count)


def undo_augmentation(s: EKFState, cam_pose_count: int, hybrid_map_size: int,
                      sqrt_mode: bool = False) -> EKFState:
    """Drop the head trail pose, shifting the trail back one slot
    (reference: updateUndoAugmentation, ekf.cpp:888-903)."""
    d = s.m.shape[0]
    dtype = s.m.dtype
    trail_dim = POSE_DIM * cam_pose_count
    idx = jnp.arange(d)
    in_shift = (idx >= CAM) & (idx + POSE_DIM < CAM + trail_dim)
    src = jnp.where(in_shift, idx + POSE_DIM, idx)
    # last trail slot zeroed (visUnaugmentA has zero rows there)
    last = (idx >= CAM + trail_dim - POSE_DIM) & (idx < CAM + trail_dim)
    keepf = (~last).astype(dtype)
    m = s.m[src] * keepf
    if sqrt_mode:
        # gathering + zeroing W rows applies the permutation to P = W W^T
        P = s.P[src, :] * keepf[:, None]
    else:
        P = s.P[src][:, src] * (keepf[:, None] * keepf[None, :])
    L = cam_pose_count
    new_times = jnp.concatenate([s.pose_times[1:], jnp.zeros((1,), dtype=s.pose_times.dtype)])
    return s._replace(m=m, P=P, pose_times=new_times, augment_count=jnp.maximum(s.augment_count - 1, 0))
