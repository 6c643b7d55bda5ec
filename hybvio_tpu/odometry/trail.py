"""Keyframe / feature-track bookkeeping ("EKFStateIndex") as fixed-shape arrays.

Redesign of the reference's pointer-based EKFStateIndex (reference:
src/odometry/ekf_state_index.{hpp,cpp}) for jit: the keyframe list becomes a
(K, T) table where K = cameraTrailLength + 1 keyframe slots (slot 0 = head =
current frame) and T = maxTracks track slots. A feature of track-slot t is
valid in keyframe k iff kf_track_id[k, t] == current track id of slot t; the
"tracks have no gaps" invariant (reference: ekf_state_index.cpp:104) is
enforced by contiguous-prefix masks.

Keyframe insertion/removal (FIFO + strided-FIFO + Tower-of-Hanoi retention,
reference: ekf_state_index.cpp:244-281) becomes a gather permutation shared
with the EKF pose-trail augmentation, keeping the two structures aligned.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# track sampling strategies (reference: parameter_definitions.c TrackSampling)
SAMPLING_GAP = 0
SAMPLING_ALL = 1
SAMPLING_RANDOM = 2

SAMPLING = {"GAP": SAMPLING_GAP, "ALL": SAMPLING_ALL, "RANDOM": SAMPLING_RANDOM}


class TrailState(NamedTuple):
    """Keyframe feature store. K = trail length + 1; T = max tracks; C = cams."""

    kf_track_id: jnp.ndarray  # (K, T) int32: track id stored at (keyframe, slot); -1 empty
    kf_norm: jnp.ndarray  # (K, T, C, 2) normalized image points
    kf_vel: jnp.ndarray  # (K, T, C, 2) normalized-point velocities
    kf_pix: jnp.ndarray  # (K, T, 2) raw left-camera pixels (scoring/visu)
    kf_stereo_idp: jnp.ndarray  # (K, T, 3) pre-triangulated stereo point (idp)
    kf_stereo_cov: jnp.ndarray  # (K, T, 3, 3)
    kf_stereo_valid: jnp.ndarray  # (K, T) bool
    kf_used: jnp.ndarray  # (K, T) bool: usedForVisualUpdate
    kf_frame_num: jnp.ndarray  # (K,) int32
    kf_time: jnp.ndarray  # (K,)
    frame_counter: jnp.ndarray  # () int32 (Hanoi scheduling counter)
    map_point_ids: jnp.ndarray  # (M,) int32 hybrid map track ids (-1 = free)


def init_trail(po, max_tracks: int, n_cams: int = 1, dtype=jnp.float64) -> TrailState:
    K = po.cameraTrailLength + 1
    T = max_tracks
    M = max(po.hybridMapSize, 1)
    return TrailState(
        kf_track_id=jnp.full((K, T), -1, dtype=jnp.int32),
        kf_norm=jnp.zeros((K, T, n_cams, 2), dtype=dtype),
        kf_vel=jnp.zeros((K, T, n_cams, 2), dtype=dtype),
        kf_pix=jnp.zeros((K, T, 2), dtype=dtype),
        kf_stereo_idp=jnp.zeros((K, T, 3), dtype=dtype),
        kf_stereo_cov=jnp.zeros((K, T, 3, 3), dtype=dtype),
        kf_stereo_valid=jnp.zeros((K, T), dtype=bool),
        kf_used=jnp.zeros((K, T), dtype=bool),
        kf_frame_num=jnp.full((K,), -1, dtype=jnp.int32),
        kf_time=jnp.full((K,), -1.0, dtype=dtype),
        frame_counter=jnp.zeros((), dtype=jnp.int32),
        map_point_ids=jnp.full((M,), -1, dtype=jnp.int32),
    )


def feature_exists(trail: TrailState, track_ids: jnp.ndarray) -> jnp.ndarray:
    """(K, T) bool: keyframe k holds a feature of the CURRENT track in slot t.

    track_ids: (T,) current track id per slot (-1 = no track).
    Applies the no-gaps invariant via a contiguous-prefix AND.
    """
    raw = (trail.kf_track_id == track_ids[None, :]) & (track_ids[None, :] >= 0)
    return jnp.cumprod(raw.astype(jnp.int32), axis=0).astype(bool)


def pop_head_keyframe(trail: TrailState) -> TrailState:
    """Drop the head keyframe, shifting everything one slot toward the head
    (reference: popHeadKeyframe). Pairs with ekf.undo_augmentation."""
    def shift(a):
        pad = jnp.zeros_like(a[-1:])
        return jnp.concatenate([a[1:], pad], axis=0)

    return trail._replace(
        kf_track_id=jnp.concatenate([trail.kf_track_id[1:], jnp.full_like(trail.kf_track_id[-1:], -1)], axis=0),
        kf_norm=shift(trail.kf_norm),
        kf_vel=shift(trail.kf_vel),
        kf_pix=shift(trail.kf_pix),
        kf_stereo_idp=shift(trail.kf_stereo_idp),
        kf_stereo_cov=shift(trail.kf_stereo_cov),
        kf_stereo_valid=shift(trail.kf_stereo_valid),
        kf_used=shift(trail.kf_used),
        kf_frame_num=jnp.concatenate([trail.kf_frame_num[1:], jnp.full((1,), -1, jnp.int32)]),
        kf_time=shift(trail.kf_time),
    )


def removed_keyframe_index(trail: TrailState, track_ids: jnp.ndarray, po):
    """Which keyframe slot to drop when pushing a new head
    (reference: removeKeyframe, ekf_state_index.cpp:244-281).

    Returns (removed_idx in [1, K-1] as the DROPPED existing slot index
    counted like the reference (where index into `keyframes` vector), and the
    updated frame counter). Note the reference erases from a vector of size K
    (before insertion), so removed index K-1 means "drop the last".
    """
    K = trail.kf_track_id.shape[0]
    kf_nonempty = jnp.any(trail.kf_track_id >= 0, axis=1)  # (K,) raw emptiness

    # free slot: any keyframe i >= 1 with no features -> drop last (K-1)
    free_slot = jnp.any(~kf_nonempty[1:]) & (not po.cameraTrailFixedScheme)

    stride = po.cameraTrailStridedStride if po.cameraTrailStridedLength > 0 else 1
    hanoi_len = po.cameraTrailHanoiLength
    frame_counter = trail.frame_counter + 1

    if stride > 1:
        strided_removed = K - 1 - po.cameraTrailStridedLength - hanoi_len - 1
    else:
        strided_removed = K - 1  # unused

    hanoi_counter = frame_counter // stride
    # removedIdx = K-1 unless a Hanoi bit fires
    removed = jnp.asarray(K - 1, dtype=jnp.int32)
    for i in range(hanoi_len - 1, -1, -1):
        bit = (hanoi_counter >> i) & 1
        removed = jnp.where(bit == 1, K - 1 - hanoi_len + i, removed)
    if stride > 1:
        removed = jnp.where(frame_counter % stride != 0, strided_removed, removed)

    removed = jnp.where(free_slot, K - 1, removed).astype(jnp.int32)
    # only advance the Hanoi counter when the scheme was actually used
    new_counter = jnp.where(free_slot, trail.frame_counter, frame_counter)
    return removed, new_counter


def push_head_keyframe(trail: TrailState, removed_idx, frame_num, timestamp) -> TrailState:
    """Insert a new (empty) head keyframe, dropping slot removed_idx
    (reference: pushHeadKeyframe). Pairs with ekf.augment_pose(removed_idx - 1).

    removed_idx indexes the PRE-insertion keyframe array; after insertion the
    new table is: new[0] = empty head, new[k] = old[k-1] for k <= removed_idx,
    new[k] = old[k] for k > removed_idx.
    """
    K = trail.kf_track_id.shape[0]
    slots = jnp.arange(K)
    src = jnp.where(slots <= removed_idx, slots - 1, slots)  # -1 = new head

    def permute(a, fill=0):
        gathered = a[jnp.clip(src, 0, K - 1)]
        shape = [1] * a.ndim
        shape[0] = K
        is_new = (slots == 0).reshape(shape)
        return jnp.where(is_new, jnp.asarray(fill, dtype=a.dtype), gathered)

    return trail._replace(
        kf_track_id=permute(trail.kf_track_id, -1),
        kf_norm=permute(trail.kf_norm),
        kf_vel=permute(trail.kf_vel),
        kf_pix=permute(trail.kf_pix),
        kf_stereo_idp=permute(trail.kf_stereo_idp),
        kf_stereo_cov=permute(trail.kf_stereo_cov),
        kf_stereo_valid=permute(trail.kf_stereo_valid),
        kf_used=permute(trail.kf_used),
        kf_frame_num=permute(trail.kf_frame_num, -1).at[0].set(jnp.asarray(frame_num, jnp.int32)),
        kf_time=permute(trail.kf_time, -1.0).at[0].set(timestamp),
    )


def insert_head_features(
    trail: TrailState, track_ids, norm_pts, pixels, valid,
    stereo_idp=None, stereo_cov=None, stereo_valid=None, timestamp=None,
    estimate_velocities=True,
) -> TrailState:
    """Write current-frame features into head keyframe slot 0
    (reference: insertFeatureUnlessExists + updateVelocities,
    backend.cpp:909-952, ekf_state_index.cpp:361-384).

    track_ids: (T,) int32; norm_pts: (T, C, 2); pixels: (T, 2); valid: (T,).
    """
    tid = jnp.where(valid, track_ids, -1).astype(jnp.int32)
    trail = trail._replace(
        kf_track_id=trail.kf_track_id.at[0].set(tid),
        kf_norm=trail.kf_norm.at[0].set(norm_pts),
        kf_pix=trail.kf_pix.at[0].set(pixels),
        kf_used=trail.kf_used.at[0].set(jnp.zeros_like(valid)),
    )
    if stereo_idp is not None:
        trail = trail._replace(
            kf_stereo_idp=trail.kf_stereo_idp.at[0].set(stereo_idp),
            kf_stereo_cov=trail.kf_stereo_cov.at[0].set(stereo_cov),
            kf_stereo_valid=trail.kf_stereo_valid.at[0].set(stereo_valid & valid),
        )
    if timestamp is not None:
        trail = trail._replace(kf_time=trail.kf_time.at[0].set(timestamp))

    if estimate_velocities:
        # velocity of head = (p0 - p1)/(t0 - t1); also refresh slot 1 velocity
        # using (p0 - p2)/(t0 - t2) when available (reference: updateVelocities)
        t0, t1, t2 = trail.kf_time[0], trail.kf_time[1], trail.kf_time[2]
        exists = feature_exists(trail, tid)
        ok1 = exists[1] & (t0 > t1)
        dt1 = jnp.where(t0 > t1, t0 - t1, 1.0)
        v0 = (trail.kf_norm[0] - trail.kf_norm[1]) / dt1
        v0 = jnp.where(ok1[:, None, None], v0, 0.0)
        ok2 = exists[2] & (t0 > t2)
        dt2 = jnp.where(t0 > t2, t0 - t2, 1.0)
        v1 = (trail.kf_norm[0] - trail.kf_norm[2]) / dt2
        v1 = jnp.where(ok2[:, None, None], v1, v0)
        v1 = jnp.where(ok1[:, None, None], v1, trail.kf_vel[1])
        trail = trail._replace(
            kf_vel=trail.kf_vel.at[0].set(v0).at[1].set(v1))
    return trail


def prune(trail: TrailState, track_ids) -> TrailState:
    """Remove features/keyframes not sharing tracks with the head, and map
    points no longer tracked (reference: EKFStateIndex::prune)."""
    exists = feature_exists(trail, track_ids)  # contiguity enforced
    # keyframe chain: keep keyframes up to the first one sharing no tracks
    kf_has_any = jnp.any(exists, axis=1)
    kf_keep = jnp.cumprod(
        jnp.concatenate([jnp.ones((1,), jnp.int32), kf_has_any[1:].astype(jnp.int32)]), axis=0
    ).astype(bool)
    keep = exists & kf_keep[:, None]
    kf_track_id = jnp.where(keep, trail.kf_track_id, -1)
    # map points must be tracked in the head keyframe
    head_ids = trail.kf_track_id[0]
    mp = trail.map_point_ids
    mp_tracked = jnp.any((mp[:, None] == head_ids[None, :]) & (mp[:, None] >= 0), axis=1)
    mp = jnp.where(mp_tracked, mp, -1)
    return trail._replace(kf_track_id=kf_track_id, map_point_ids=mp)


def select_track_poses(trail: TrailState, slot: jnp.ndarray, track_ids, sampling: int, rng_key, random_ratio: float = 0.75):
    """Per-track pose selection (reference: createTrackIndex).

    Returns (selected (K,) bool, exists (K,) bool) for the track in `slot`.
    """
    exists = feature_exists(trail, track_ids)[:, slot]  # (K,)
    used = trail.kf_used[:, slot]
    K = exists.shape[0]
    ks = jnp.arange(K)
    if sampling == SAMPLING_ALL:
        return exists, exists
    if sampling == SAMPLING_GAP:
        start_index = jnp.max(jnp.where(exists, ks, -1))
        sel = exists & (~used | (ks == start_index))
        return sel, exists
    # RANDOM
    avail = exists & ~used
    n_avail = jnp.sum(avail)
    n_take = jnp.round(random_ratio * n_avail).astype(jnp.int32)
    scores = jax.random.uniform(rng_key, (K,))
    scores = jnp.where(avail, scores, -1.0)
    order = jnp.argsort(-scores)
    rank = jnp.zeros(K, jnp.int32).at[order].set(ks.astype(jnp.int32))
    sel = avail & (rank < n_take)
    sel = sel.at[0].set(exists[0])  # always include the head point
    return sel, exists


def track_scores(trail: TrailState, track_ids, sampling: int) -> jnp.ndarray:
    """(T,) track score = L1 path length of the selected points
    (reference: trackScore). For RANDOM, the count-based score."""
    exists = feature_exists(trail, track_ids)  # (K, T)
    used = trail.kf_used
    K = exists.shape[0]
    ks = jnp.arange(K)[:, None]
    if sampling == SAMPLING_RANDOM:
        return jnp.sum(exists & ~used, axis=0).astype(trail.kf_norm.dtype)
    if sampling == SAMPLING_GAP:
        start_index = jnp.max(jnp.where(exists, ks, -1), axis=0)[None, :]
        sel = exists & (~used | (ks == start_index))
    else:
        sel = exists
    # L1 distance between consecutive *existing* left-camera image points,
    # summed over selected rows (skipping k=0 which has no predecessor)
    p = trail.kf_pix  # (K, T, 2)
    step = jnp.sum(jnp.abs(p[:-1] - p[1:]), axis=-1)  # (K-1, T): |p_k - p_{k+1}|
    contrib = sel[:-1] & exists[1:]
    return jnp.sum(jnp.where(contrib, step, 0.0), axis=0)


def mark_track_used(trail: TrailState, slot, selected, sampling: int, track_ids) -> TrailState:
    """(reference: markTrackUsed)"""
    if sampling == SAMPLING_ALL:
        return trail
    if sampling == SAMPLING_GAP:
        exists = feature_exists(trail, track_ids)[:, slot]
        used = trail.kf_used.at[:, slot].set(trail.kf_used[:, slot] | exists)
    else:
        used = trail.kf_used.at[:, slot].set(trail.kf_used[:, slot] | selected)
    return trail._replace(kf_used=used)


def offer_map_point(trail: TrailState, track_id):
    """First free hybrid map slot, or -1 (reference: offerMapPoint)."""
    mp = trail.map_point_ids
    free = mp < 0
    idx = jnp.argmax(free)
    available = jnp.any(free)
    new_mp = jnp.where(
        available, mp.at[idx].set(jnp.asarray(track_id, jnp.int32)), mp
    )
    return jnp.where(available, idx, -1).astype(jnp.int32), trail._replace(map_point_ids=new_mp)
