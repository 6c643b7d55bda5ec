"""Tracker core: the track-lifecycle engine (device-side).

Port of the reference tracker (reference: src/tracker/tracker.cpp) as pure
functions over a fixed-shape TrackerState: per frame — LK-track prev->cur
(with odometry-predicted initial guesses), RANSAC outlier pass, adaptive
detection-mask radius targeting maxTracks, distance-based culling at capacity,
keyframe/visual-stationarity decision, and new-feature top-up when >10% of
slots are free. Produces the TrackerInput arrays the backend consumes.

Track slots are stable: a live track keeps its slot; freed slots are refilled
by detection. Mono first; the stereo path (right-camera flow + epipolar
check) plugs into the same slots.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.cameras import Camera
from .gftt import detect_corners, subpixel_refine
from .lk import FLOW_OK, FLOW_OUT_OF_RANGE, LKParams, lk_track_pyramid, precompute_prev
from .pyramid import build_pyramid
from .ransac import hybrid_ransac, ransac2

# per-track lifecycle status codes (reference: tracker::Feature::Status,
# src/tracker/track.hpp:9-20); -1 = empty slot
ST_TRACKED = 0
ST_NEW = 1
ST_FAILED_FLOW = 2
ST_RANSAC_OUTLIER = 3
ST_FLOW_OUT_OF_RANGE = 4
ST_OUT_OF_RANGE = 5
ST_FAILED_EPIPOLAR_CHECK = 6
ST_CULLED = 7
ST_BLACKLISTED = 8


class TrackerState(NamedTuple):
    track_ids: jnp.ndarray  # (T,) int32, -1 = free slot
    px: jnp.ndarray  # (T, C, 2) current positions
    prev_pyr: Tuple[jnp.ndarray, ...]  # previous-frame pyramid levels
    prev_ix: Tuple[jnp.ndarray, ...]
    prev_iy: Tuple[jnp.ndarray, ...]
    mask_scale: jnp.ndarray  # () adaptive detection mask exponent
    next_track_id: jnp.ndarray  # () int32
    last_kf_px: jnp.ndarray  # (T, 2) corner at last keyframe (per live track)
    last_kf_id: jnp.ndarray  # (T,) int32 track id the above belongs to
    frame_num: jnp.ndarray  # () int32
    prev_time: jnp.ndarray  # ()


class TrackerOutput(NamedTuple):
    track_ids: jnp.ndarray  # (T,) int32: tracked & inlier tracks (else -1)
    pixels: jnp.ndarray  # (T, C, 2)
    keyframe: jnp.ndarray  # () bool
    ransac_score: jnp.ndarray  # () stationarity score (R2 inlier fraction)
    n_tracks: jnp.ndarray  # () int32
    # visualization payload (reference: TaggedFrame flowCorners*/flowStatus +
    # corners, odometry/tagged_frame.hpp:48-58): EVERY slot's lifecycle
    # outcome this frame, incl. failures the filtered track_ids hide
    status: jnp.ndarray  # (T,) int32 ST_* code, -1 = empty slot
    prev_pixels: jnp.ndarray  # (T, C, 2) previous-frame positions
    viz_pixels: jnp.ndarray  # (T, C, 2) attempted/current positions (all slots)


def make_tracker(params, cameras, max_tracks: Optional[int] = None, dtype=jnp.float32,
                 derived=None):
    """Build (init_fn(first_image[s]), track_frame) for static parameters.

    Images are float (H, W) in [0, 1]. LK/GFTT thresholds from the parameter
    surface are interpreted on the reference's scales and adapted internally.
    """
    pt = params.tracker
    T = max_tracks if max_tracks is not None else pt.maxTracks
    use_stereo = bool(pt.useStereo)
    C = 2 if use_stereo else 1
    cam0 = cameras[0]
    H, W = cam0.height, cam0.width
    assert H > 0 and W > 0, "tracker camera needs width/height"
    min_dim = min(H, W)
    su = min_dim / 720.0  # reference scale unit (ransac_pipeline.cpp:86-88)

    # clamp pyramid depth so every level fits the LK sampling patches
    # (ps_c = window + 19; cv::buildOpticalFlowPyramid likewise stops once
    # a level is smaller than the window)
    _max_level = pt.pyrLKMaxLevel
    while _max_level > 0 and (min_dim >> _max_level) < pt.pyrLKWindowSize + 19:
        _max_level -= 1

    lk_params = LKParams(
        window_size=pt.pyrLKWindowSize,
        max_level=_max_level,
        max_iter=pt.pyrLKMaxIter,
        epsilon=pt.pyrLKEpsilon,
        # lk_track_pyramid converts min-eig to cv units (MIN_EIG_CV_SCALE),
        # so the reference's parameter scale passes through unchanged
        min_eig_threshold=pt.pyrLKMinEigThreshold,
    )
    ransac2_threshold = pt.ransac2Threshold * su
    # R5 threshold in normalized coordinates (reference: ransac_pipeline.cpp:329)
    import numpy as _np
    _f0 = float(_np.asarray(cam0.fx) + _np.asarray(cam0.fy)) * 0.5
    _f1 = float(_np.asarray(cameras[-1].fx) + _np.asarray(cameras[-1].fy)) * 0.5
    ransac5_threshold = 2.0 * pt.ransac5Threshold / (_f0 + _f1)
    if use_stereo:
        assert derived is not None, "stereo tracker needs DerivedParameters"
        cam1 = cameras[1]
        _c0c1 = np.asarray(derived.second_imu_to_camera) @ np.linalg.inv(np.asarray(derived.imu_to_camera))
        cam0_to_cam1 = jnp.asarray(_c0c1, dtype)
        epipolar_dist = pt.maxStereoEpipolarDistance * su
    min_distance = max(pt.gfttMinDistance * su, 2.0)
    move_threshold = pt.visualStationarityMovementThreshold
    score_threshold = pt.visualStationarityScoreThreshold

    def mask_radius(mask_scale):
        r = jnp.power(1.3, mask_scale) * min_dim * pt.relativeMaskRadius
        return jnp.maximum(jnp.round(r), 2.0)

    def detect(img, existing_xy, existing_valid, mscale, n_out):
        if pt.featureDetector.upper() == "FAST":
            # legacy cv::FAST option (reference: feature_detector_legacy.cpp
            # :34-60, dispatch feature_detector.cpp:671-675)
            from .fast import detect_fast

            xy, score, valid = detect_fast(
                img, n_out, existing_xy, existing_valid,
                mask_radius=mask_radius(mscale),
                min_distance=min_distance,
                threshold=20.0 / 255.0,  # cv::FAST default used by the reference
            )
        else:
            xy, score, valid = detect_corners(
                img, n_out, existing_xy, existing_valid,
                mask_radius=mask_radius(mscale),
                min_distance=min_distance,
                block_size=pt.gfttBlockSize,
                min_response=pt.gfttMinResponse,
                # enough spaced block-maxima candidates to fill every slot
                # even with the min-distance mask rejecting most (a hard 128
                # could never fill tracker.maxTracks > 128 slots)
                n_candidates=max(2 * T, 128),
                crop_fraction=pt.partOfImageToDetectFeatures,
                quality_level=pt.gfttQualityLevel,
            )
        if pt.subPixMaxIter > 0:
            # corner subpixel refinement (reference: subpixel_adjuster.cpp
            # wrapping cv::cornerSubPix, enabled iff subPixMaxIter > 0)
            xy = subpixel_refine(img, xy, window=min(pt.subPixWindowSize, 7),
                                 iters=min(pt.subPixMaxIter, 5),
                                 epsilon=pt.subPixEpsilon)
        return xy, score, valid

    def stereo_match(left_pyr, left_grads, right_pyr, pts_left, valid, guesses=None):
        """Left->right LK + epipolar-curve validation (reference:
        tracker.cpp:409-463 STEREO flow + markCornersFailedByEpipolarConstraint)."""
        g = pts_left if guesses is None else guesses
        if guesses is not None and lk_params.max_level > 1:
            # with a predicted disparity guess the residual search range is
            # small; a 2-level LK converges (TPU: skips the deep-level sweeps)
            nl = 2
            sm_params = lk_params._replace(max_level=nl - 1)
            pts_right, status, _ = lk_track_pyramid(
                left_pyr[:nl], left_grads[:nl], right_pyr[:nl], pts_left,
                initial_pts=g, params=sm_params)
        else:
            pts_right, status, _ = lk_track_pyramid(
                left_pyr, left_grads, right_pyr, pts_left, initial_pts=g,
                params=lk_params)
        ok = valid & (status == FLOW_OK)
        if pt.maxStereoEpipolarDistance > 0:
            from .stereo import epipolar_check
            ok = ok & epipolar_check(cam0, cam1, pts_left, pts_right, ok,
                                     cam0_to_cam1, epipolar_dist)
        return pts_right, ok

    def init_fn(first_image, t0=0.0, second_image=None) -> TrackerState:
        """Initialize from the first frame (reference: initialize(),
        tracker.cpp:748-762): detect features, reset all tracks."""
        img = jnp.asarray(first_image, dtype=dtype)
        pyr, grads = precompute_prev(img, lk_params)
        xy, score, valid = detect(
            img, jnp.zeros((1, 2), dtype), jnp.zeros((1,), bool),
            jnp.zeros((), dtype), T)
        px = jnp.zeros((T, C, 2), dtype).at[:, 0, :].set(xy)
        if use_stereo:
            assert second_image is not None
            rpyr = build_pyramid(jnp.asarray(second_image, dtype=dtype), lk_params.max_level)
            rxy, rok = stereo_match(pyr, grads, rpyr, xy, valid)
            valid = valid & rok
            px = px.at[:, 1, :].set(rxy)
        ids = jnp.where(valid, jnp.arange(T, dtype=jnp.int32) + 1, -1)
        return TrackerState(
            track_ids=ids,
            px=px,
            prev_pyr=tuple(pyr),
            prev_ix=tuple(g[0] for g in grads),
            prev_iy=tuple(g[1] for g in grads),
            mask_scale=jnp.zeros((), dtype),
            next_track_id=jnp.asarray(T + 1, jnp.int32),
            last_kf_px=xy,
            last_kf_id=ids,
            frame_num=jnp.asarray(1, jnp.int32),
            prev_time=jnp.asarray(t0, dtype),
        )

    def track_frame(ts: TrackerState, image, rng_key, t,
                    flow_guess=None, blacklist_flags=None, blacklist_ids=None,
                    second_image=None, stereo_guess=None, pose_rot=None,
                    camera0=None):
        """Process one new frame; returns (new_state, TrackerOutput).

        camera0: optional dynamic Camera overriding the static cam0 for this
        frame (per-frame varying intrinsics; mono only — the stereo geometry
        constants are baked). Same pytree structure as cam0 => no retrace.
        """
        if camera0 is not None:
            assert not use_stereo, "varying intrinsics supported for mono only"
            c0 = camera0
            # R5 threshold scales with the CURRENT focal length
            # (reference: ransac_pipeline.cpp:329 divides by the lens focal)
            r5_threshold = pt.ransac5Threshold / ((c0.fx + c0.fy) * 0.5)
        else:
            c0 = cam0
            r5_threshold = ransac5_threshold
        img = jnp.asarray(image, dtype=dtype)
        cur_pyr = build_pyramid(img, lk_params.max_level)
        from .pyramid import scharr_gradients as _scharr
        cur_grads = [_scharr(p) for p in cur_pyr]
        if use_stereo:
            assert second_image is not None
            right_pyr = build_pyramid(jnp.asarray(second_image, dtype=dtype), lk_params.max_level)

        alive = ts.track_ids >= 0
        # blacklist feedback from the odometry (reference: deleteTrack)
        if blacklist_flags is not None:
            black = blacklist_flags & (blacklist_ids == ts.track_ids) & alive
        else:
            black = jnp.zeros((T,), bool)

        # --- optical flow prev -> cur (left camera) ---
        prev_px = ts.px[:, 0, :]
        guesses = prev_px if flow_guess is None else jnp.where(
            alive[:, None], flow_guess, prev_px)
        new_px, flow_status, _ = lk_track_pyramid(
            list(ts.prev_pyr),
            list(zip(ts.prev_ix, ts.prev_iy)),
            cur_pyr, prev_px, initial_pts=guesses, params=lk_params)
        flow_ok = alive & (flow_status == FLOW_OK) & ~black
        tracked = flow_ok

        # --- stereo: match left->right on the CURRENT pair (reference:
        # tracker.cpp:409-463, default !independentStereoOpticalFlow) ---
        if use_stereo:
            right_px, stereo_ok = stereo_match(
                cur_pyr, cur_grads, right_pyr, new_px, tracked,
                guesses=stereo_guess)
            tracked = tracked & stereo_ok

        # --- RANSAC outlier pass (reference: ransac_pipeline.cpp:119-150:
        # R2 always runs for the stationarity score; stereo prefers RANSAC3;
        # mono uses the hybrid R2/R5 selection) ---
        rng_key, r_key = jax.random.split(rng_key)
        from ..geometry.cameras import normalize_pixel as _norm_px
        n1, ok_n1 = _norm_px(c0, prev_px)
        n2, ok_n2 = _norm_px(c0, new_px)
        valid_n = tracked & ok_n1 & ok_n2
        stereo_pose_ransac = use_stereo and (
            pt.useRansac3 or (pt.useStereoUpright2p and pose_rot is not None))
        if stereo_pose_ransac:
            # reference dispatch (ransac_pipeline.cpp:121-133): with RANSAC3 /
            # upright-2p active, the hybrid R2/R5 is NOT run — R2 alone still
            # runs for the stationarity score
            r2only = ransac2(c0, c0, prev_px, new_px, valid_n, r_key,
                             ransac2_threshold)
            from .ransac import HybridRansacResult

            hr = HybridRansacResult(
                inliers=r2only.inliers, score=r2only.score,
                used_r5=jnp.zeros((), bool), skipped=jnp.sum(valid_n) < 2)
        elif pt.useHybridRansac:
            hr = hybrid_ransac(c0, c0, prev_px, new_px, n1, n2,
                               valid_n, r_key, pt,
                               ransac2_threshold, r5_threshold)
        else:
            # useHybridRansac=false (reference: ransac_pipeline.cpp:128,
            # 135-137 else-branch): R2 still computes the stationarity
            # score but NO ransac invalidates tracks
            r2only = ransac2(c0, c0, prev_px, new_px, valid_n, r_key,
                             ransac2_threshold)
            from .ransac import HybridRansacResult

            hr = HybridRansacResult(
                inliers=valid_n, score=r2only.score,
                used_r5=jnp.zeros((), bool), skipped=jnp.zeros((), bool))
        ransac_inliers = hr.inliers
        ransac_skipped = hr.skipped
        if use_stereo and pt.useRansac3:
            # stereo 2D-3D absolute pose (reference: doRansac3)
            from functools import partial as _partial

            from ..odometry.triangulation import triangulate_stereo_idp
            from .ransac import ransac3

            rng_key, r3_key = jax.random.split(rng_key)
            n1r, ok1r = _norm_px(cam1, ts.px[:, 1, :])
            n2r, ok2r = _norm_px(cam1, right_px)
            # second-to-first camera = inverse of cam0->cam1
            s2f = jnp.linalg.inv(cam0_to_cam1)
            tri = jax.vmap(_partial(triangulate_stereo_idp, with_cov=False),
                           in_axes=(0, 0, None))
            idp_prev, _, okt1 = tri(n1, n1r, s2f)
            idp_cur, _, okt2 = tri(n2, n2r, s2f)

            def idp_to_xyz(idp):
                z = 1.0 / jnp.where(jnp.abs(idp[:, 2]) > 1e-9, idp[:, 2], 1.0)
                return jnp.stack([idp[:, 0] * z, idp[:, 1] * z, z], axis=1)

            v3 = valid_n & ok1r & ok2r & okt1 & okt2 & (idp_prev[:, 2] > 1e-4) & (idp_cur[:, 2] > 1e-4)
            # 64 vmapped hypotheses: stereo 3-point sampling at realistic
            # inlier ratios saturates success probability well below the
            # reference's adaptive cap (ransac3MaxIterations=500)
            r3 = ransac3(idp_to_xyz(idp_prev), idp_to_xyz(idp_cur), n2, v3,
                         r3_key, error_thresh=pt.ransac3ErrorThresh,
                         max_iters=64)
            frac3 = r3.inlier_count / jnp.maximum(jnp.sum(valid_n), 1).astype(img.dtype)
            r3_good = r3.ok & (frac3 >= pt.ransacMinInlierFraction)
            ransac_inliers = jnp.where(r3_good, r3.inliers, ransac_inliers)
            ransac_skipped = jnp.where(r3_good, False, ransac_skipped)
        elif use_stereo and pt.useStereoUpright2p and pose_rot is not None:
            # gravity-aligned 2-point pose (reference: ransac_pipeline.cpp
            # :124-127 dispatch, stereo_upright_2p.cpp:119-166): model points
            # = previous stereo triangulations rotated to world by R0; rays =
            # current left-camera bearings rotated by R1; inlier error in the
            # current camera frame
            from functools import partial as _partial

            from ..odometry.triangulation import triangulate_stereo_idp
            from .ransac import stereo_upright_2p

            R0, R1 = pose_rot  # camera-to-world rotations (prev, cur)
            R0 = R0.astype(img.dtype)
            R1 = R1.astype(img.dtype)
            rng_key, up_key = jax.random.split(rng_key)
            n1r, ok1r = _norm_px(cam1, ts.px[:, 1, :])
            s2f = jnp.linalg.inv(cam0_to_cam1)
            tri = jax.vmap(_partial(triangulate_stereo_idp, with_cov=False),
                           in_axes=(0, 0, None))
            idp_prev, _, okt1 = tri(n1, n1r, s2f)
            okd = idp_prev[:, 2] > 1e-4
            z = 1.0 / jnp.where(okd, idp_prev[:, 2], 1.0)
            p_cam = jnp.stack(
                [idp_prev[:, 0] * z, idp_prev[:, 1] * z, z], axis=1)
            rays_cam = jnp.concatenate(
                [n2, jnp.ones((T, 1), img.dtype)], axis=1)
            rays_cam = rays_cam / jnp.linalg.norm(rays_cam, axis=1, keepdims=True)
            v_up = valid_n & ok1r & okt1 & okd
            up = stereo_upright_2p(
                p_cam @ R0.T, rays_cam @ R1.T, v_up, up_key,
                error_thresh=pt.ransacStereoUpright2pErrorThresh,
                world_to_cam=R1.T, cur_norm=n2)
            frac_up = up.inlier_count / jnp.maximum(
                jnp.sum(valid_n), 1).astype(img.dtype)
            up_good = up.ok & (frac_up >= pt.ransacMinInlierFraction)
            ransac_inliers = jnp.where(up_good, up.inliers, ransac_inliers)
            ransac_skipped = jnp.where(up_good, False, ransac_skipped)
        inlier = tracked & ransac_inliers
        # RANSAC skipped entirely -> all tracks become outliers (reference:
        # ransac_pipeline.cpp:139-147), except during bootstrap (<2 tracks)
        few = jnp.sum(tracked) < 2
        inlier = jnp.where(ransac_skipped & ~few, False, inlier)
        inlier = jnp.where(few, tracked, inlier)
        r2 = hr  # .score used below

        # --- keyframe / visual stationarity (reference: tracker.cpp:577-601) ---
        kf_known = (ts.last_kf_id == ts.track_ids) & alive
        move = jnp.linalg.norm(new_px - ts.last_kf_px, axis=-1)
        move = jnp.where(tracked & kf_known, move, -1.0)
        max_move = jnp.max(move)
        has_move = max_move >= 0.0
        stationary = (
            has_move & (max_move < move_threshold) & (r2.score > score_threshold))
        keyframe = (ts.frame_num < pt.maxTrackLength) | ~stationary

        # --- track updates (reference: updateTracks) ---
        # capacity culling: when full, drop ~T/20 of the closest pairs
        n_alive = jnp.sum(inlier)
        d2 = jnp.sum((new_px[:, None, :] - new_px[None, :, :]) ** 2, axis=-1)
        pairmask = inlier[:, None] & inlier[None, :]
        iu = jnp.triu_indices(T, k=1)
        pd = jnp.where(pairmask[iu], d2[iu], jnp.inf)
        n_cull = max(T // 20, 1)
        # for the n_cull smallest pair distances, cull the larger slot index
        small = jnp.argsort(pd)[:n_cull]
        cull_slots = jnp.maximum(iu[0][small], iu[1][small])
        cull_valid = jnp.isfinite(pd[small]) & (n_alive >= T)
        cull = jnp.zeros((T,), bool).at[cull_slots].set(cull_valid, mode="drop")

        keep = inlier & ~cull
        ids = jnp.where(keep, ts.track_ids, -1)
        px = ts.px.at[:, 0, :].set(jnp.where(keep[:, None], new_px, 0.0))
        if use_stereo:
            px = px.at[:, 1, :].set(jnp.where(keep[:, None], right_px, 0.0))

        # --- new feature detection (reference: detectNewFeatures; only when
        # >10% of slots are free, tracker.cpp:672-703). lax.cond skips the
        # detection program entirely on full frames in the un-vmapped
        # (single-sequence / live) path; under vmap it lowers to select and
        # both branches run, which matches the old behavior
        missing = T - jnp.sum(keep)
        do_detect = missing >= T // 10

        def run_detect(_):
            det_xy, det_score, det_valid = detect(
                img, px[:, 0, :], keep, ts.mask_scale, T)
            if use_stereo:
                # fill-time stereo match with the shallow guided path (guess
                # = zero disparity): 2-level LK catches ~+-30 px, i.e. depth
                # down to ~f*baseline/30; nearer fills fail the epipolar gate
                # and the slot retries next frame
                det_right, det_sok = stereo_match(
                    cur_pyr, cur_grads, right_pyr, det_xy, det_valid,
                    guesses=det_xy)
                return det_xy, det_valid & det_sok, det_right
            return det_xy, det_valid, det_xy

        def skip_detect(_):
            z = jnp.zeros((T, 2), dtype)
            return z, jnp.zeros((T,), bool), z

        det_xy, det_valid, det_right = jax.lax.cond(
            do_detect, run_detect, skip_detect, None)
        det_valid = det_valid & do_detect
        # fill free slots with detections, in order
        free = ~keep
        free_order = jnp.argsort(~free, stable=True)  # free slots first
        n_free = jnp.sum(free)
        take = jnp.minimum(n_free, jnp.sum(det_valid))
        det_order = jnp.argsort(~det_valid, stable=True)
        slot_for_det = free_order  # (T,)
        det_idx = det_order
        fill = jnp.arange(T) < take
        new_ids = ids.at[slot_for_det].set(
            jnp.where(fill, ts.next_track_id + jnp.arange(T, dtype=jnp.int32), ids[slot_for_det]), mode="drop")
        new_xy0 = px[:, 0, :].at[slot_for_det].set(
            jnp.where(fill[:, None], det_xy[det_idx], px[slot_for_det, 0, :]), mode="drop")
        px = px.at[:, 0, :].set(new_xy0)
        if use_stereo:
            new_xy1 = px[:, 1, :].at[slot_for_det].set(
                jnp.where(fill[:, None], det_right[det_idx], px[slot_for_det, 1, :]), mode="drop")
            px = px.at[:, 1, :].set(new_xy1)
        ids = new_ids
        next_id = ts.next_track_id + take.astype(jnp.int32)

        # adaptive mask scale (reference: tracker.cpp:592-601 + changeMaskSize)
        n_after = jnp.sum(ids >= 0)
        mscale = ts.mask_scale
        mscale = jnp.where(n_after < (3 * T) // 4, mscale - 1.0, mscale)
        mscale = jnp.where(n_after == T, mscale + 0.5, mscale)
        mscale = jnp.clip(mscale, -5.0, 5.0)

        # last-keyframe corners for stationarity (only tracked, on keyframes)
        upd = keyframe & keep
        last_kf_px = jnp.where(upd[:, None], px[:, 0, :], ts.last_kf_px)
        last_kf_id = jnp.where(upd, ids, ts.last_kf_id)
        # forget entries whose track died
        still = last_kf_id == ids
        last_kf_id = jnp.where(still, last_kf_id, -1)

        grads = cur_grads
        new_state = TrackerState(
            track_ids=ids,
            px=px,
            prev_pyr=tuple(cur_pyr),
            prev_ix=tuple(g[0] for g in grads),
            prev_iy=tuple(g[1] for g in grads),
            mask_scale=mscale,
            next_track_id=next_id,
            last_kf_px=last_kf_px,
            last_kf_id=last_kf_id,
            frame_num=ts.frame_num + 1,
            prev_time=jnp.asarray(t, dtype),
        )
        # --- per-slot lifecycle status for visualization (reference:
        # Feature::Status, track.hpp:9-20; TaggedFrame flowStatus) ---
        status = jnp.where(alive, ST_FAILED_FLOW, -1).astype(jnp.int32)
        status = jnp.where(alive & (flow_status == FLOW_OUT_OF_RANGE),
                           ST_FLOW_OUT_OF_RANGE, status)
        status = jnp.where(flow_ok, ST_TRACKED, status)
        if use_stereo:
            status = jnp.where(flow_ok & ~stereo_ok,
                               ST_FAILED_EPIPOLAR_CHECK, status)
        status = jnp.where(alive & black, ST_BLACKLISTED, status)
        status = jnp.where(tracked & ~inlier, ST_RANSAC_OUTLIER, status)
        status = jnp.where(inlier & cull, ST_CULLED, status)
        status = status.at[slot_for_det].set(
            jnp.where(fill, ST_NEW, status[slot_for_det]), mode="drop")
        # attempted/current positions for every slot: detections and kept
        # tracks read the committed px; failed slots show where LK landed
        viz0 = jnp.where((keep | ~alive)[:, None], px[:, 0, :], new_px)
        if use_stereo:
            viz1 = jnp.where((keep | ~alive)[:, None], px[:, 1, :], right_px)
            viz_px = jnp.stack([viz0, viz1], axis=1)
        else:
            viz_px = viz0[:, None, :]

        # output: only tracks that were TRACKED THIS FRAME (not fresh detections,
        # which have no history yet -- they enter the trail next frame like the
        # reference where output.tracks excludes new detections)
        out_ids = jnp.where(keep, ts.track_ids, -1)
        out = TrackerOutput(
            track_ids=out_ids,
            pixels=jnp.where(keep[:, None, None], px, 0.0),
            keyframe=keyframe,
            ransac_score=r2.score,
            n_tracks=jnp.sum(keep).astype(jnp.int32),
            status=status,
            prev_pixels=ts.px,
            viz_pixels=viz_px,
        )
        return new_state, out

    return init_fn, track_frame
