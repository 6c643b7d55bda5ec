"""The odometry backend: one jitted frame step.

Port of the reference Session::process + trackerVisualUpdate orchestration
(reference: src/odometry/backend.cpp:716-1290) redesigned as a single
fixed-shape XLA program per frame:

    frame_step(state, imu_batch, tracker_input) -> (state, output)

  * the IMU samples between frames run as a lax.scan of EKF predicts +
    control updates (the reference processes them one by one at ~400 Hz on a
    thread; here they are a fused on-device scan),
  * the per-track visual-update loop (budgeted, sequential, order-randomized)
    becomes a lax.scan over a candidate list chosen on device,
  * keyframe push/pop maps to the gather-permutations shared by the trail
    store and the EKF augmentation ops.

The tracker is an input interface (TrackerInput): the image front-end
(frontend/) or a synthetic ground-truth tracker (io/synthetic.py) both
produce it, which keeps the estimator testable without the vision stack
(mirroring how reference tests construct SampleSync/EKF directly).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import ekf as ekf_mod
from ..ekf import (
    BGA, CAM, INER_DIM, ORI, POS, POSE_DIM, SFT, VEL, EKFState,
    augment_pose, init_state, initialize_orientation, make_predict,
    undo_augmentation, update_pseudo_velocity, update_zupt,
    update_zupt_initialization, visual_track_update, insert_map_point,
    map_point_offset,
)
from ..geometry.cameras import Camera, normalize_pixel
from ..ekf.sqrt import cov_block, cov_diag
from . import trail as tr
from .visual_update import make_prepare_track_update
from .triangulation import TRI_OK

# tracking status (reference: src/api/types.hpp:34-38)
STATUS_INIT = 0
STATUS_TRACKING = 1
STATUS_LOST_TRACKING = 2

# point cloud feature status (reference: src/odometry/output.hpp:31-44)
PF_UNUSED = 0
PF_POSE_TRAIL = 1
PF_HYBRID = 2
PF_SLAM = 3
PF_OUTLIER = 4
PF_STEREO = 5


class TrackerInput(NamedTuple):
    """Output of the tracker front-end for one frame (fixed shapes).

    T track slots; C cameras. Tracks must already be optical-flow tracked and
    RANSAC-filtered (status TRACKED in reference terms).
    """

    track_ids: jnp.ndarray  # (T,) int32, -1 = empty slot
    pixels: jnp.ndarray  # (T, C, 2) current pixel positions
    keyframe: jnp.ndarray  # () bool: tracker keyframe decision
    # stereo-only extras (zeros when mono):
    stereo_depth: jnp.ndarray  # (T,) dense-depth at track, -1 = none
    # visualization payload passthrough (reference: TaggedFrame,
    # odometry/tagged_frame.hpp:48-58); None when the caller doesn't render
    track_status: Optional[jnp.ndarray] = None  # (T,) int32 ST_* code
    prev_pixels: Optional[jnp.ndarray] = None  # (T, C, 2)
    viz_pixels: Optional[jnp.ndarray] = None  # (T, C, 2)


class ImuBatch(NamedTuple):
    t: jnp.ndarray  # (S,)
    gyro: jnp.ndarray  # (S, 3)
    acc: jnp.ndarray  # (S, 3)
    valid: jnp.ndarray  # (S,) bool


class BackendState(NamedTuple):
    ekf: EKFState
    trail: tr.TrailState
    blacklist_flags: jnp.ndarray  # (T,) bool: slot blacklisted last frame
    blacklist_ids: jnp.ndarray  # (T,) int32: the id the flag belongs to
    frames_since_keyframe: jnp.ndarray  # () int32
    orientation_initialized: jnp.ndarray  # () bool
    vu_window: jnp.ndarray  # (W,) good-frame history (1/0), ring
    vu_window_t: jnp.ndarray  # (W,) entry frame times (for the TIME window)
    vu_window_count: jnp.ndarray  # () int32 entries so far
    vu_window_pos: jnp.ndarray  # () int32
    tracking_status: jnp.ndarray  # () int32
    rng: jnp.ndarray  # jax PRNG key
    frame_number: jnp.ndarray  # () int32


class FrameOutput(NamedTuple):
    t: jnp.ndarray  # ()
    position: jnp.ndarray  # (3,)
    velocity: jnp.ndarray  # (3,)
    orientation: jnp.ndarray  # (4,)
    bias_gyro: jnp.ndarray  # (3,)
    bias_acc: jnp.ndarray  # (3,)
    position_cov: jnp.ndarray  # (3,3)
    velocity_cov: jnp.ndarray  # (3,3)
    bias_cov_diag: jnp.ndarray  # (9,) diag(P) over BGA(3)+BAA(3)+BAT(3)
    tracking_status: jnp.ndarray  # () int32
    stationary_visual: jnp.ndarray  # () bool
    point_cloud: jnp.ndarray  # (NV, 3)
    point_cloud_status: jnp.ndarray  # (NV,) int32 (PF_*)
    point_cloud_ids: jnp.ndarray  # (NV,) int32
    pose_trail: jnp.ndarray  # (L, 7) trail pose states
    pose_trail_times: jnp.ndarray  # (L,)
    good_frame: jnp.ndarray  # () bool
    keyframe: jnp.ndarray  # () bool (tracker decision, for SLAM cadence)
    track_ids: jnp.ndarray  # (T,) current tracked ids (for SLAM features)
    track_norm: jnp.ndarray  # (T, 2) normalized left-camera points
    track_depth: jnp.ndarray  # (T,) dense stereo z-depth in cam0, -1 = none
    # tagged-frame visualization payload (reference: TaggedFrame +
    # TrackVisualization, odometry/tagged_frame.hpp:17-58)
    track_status: jnp.ndarray  # (T,) int32 tracker ST_* code, -1 = empty
    track_prev_pixels: jnp.ndarray  # (T, C, 2) previous-frame positions
    track_pixels: jnp.ndarray  # (T, C, 2) attempted/current positions
    # per-VU-candidate statuses, aligned with point_cloud_ids (reference:
    # TrackVisualization.triangulateStatus/prepareVuStatus)
    vu_tri_status: jnp.ndarray  # (NV,) int32 TRI_* code
    vu_prepare_status: jnp.ndarray  # (NV,) int32 prepare status
    # estimated IMU-to-camera time shift (state SFT component), carried in
    # the output so the host sample-sync feedback (reference:
    # control.cpp:97-106) never needs a separate blocking state fetch
    sft: jnp.ndarray  # ()


def _highest_precision(fn):
    """Trace the wrapped function with full-f32 matmuls: triangulation and
    measurement-jacobian chains lose real ATE at 3-pass 'high' (the program
    default on TPU); these matmuls are tiny so the cost is negligible."""
    def wrapped(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)
    return wrapped


def make_backend(params, derived, cameras, max_tracks: Optional[int] = None,
                 dtype=jnp.float64, n_visual_candidates: Optional[int] = None):
    """Build (init_fn, frame_step) for static parameters.

    params: Parameters; derived: DerivedParameters; cameras: (cam0,) or
    (cam0, cam1) Camera models.
    """
    po = params.odometry
    pt = params.tracker
    use_stereo = bool(pt.useStereo)
    n_cams = 2 if use_stereo else 1
    T = max_tracks if max_tracks is not None else pt.maxTracks
    L = po.cameraTrailLength
    K = L + 1
    M = po.hybridMapSize
    d = ekf_mod.state_dim(L, M)
    noise_scale = po.noiseScale**2
    sampling = tr.SAMPLING[po.trackSampling]
    if n_visual_candidates is None:
        NV = min(T, (po.maxVisualUpdates if po.maxVisualUpdates > 0 else T) + 12)
    else:
        NV = n_visual_candidates
    # good-frame ring: the reference sizes a CircularBuffer at
    # targetFps/N * window entries (backend.cpp:195-197); we keep 2x
    # headroom so the TIME mask below still covers the full window when the
    # actual frame rate exceeds targetFps
    W_arm = max(int(pt.targetFps / max(po.visualUpdateForEveryNFrame, 1)
                    * po.goodFramesTimeWindowSeconds), 1)
    W = max(2 * W_arm, 4)

    sqrt_mode = bool(getattr(po, "useSquareRootEkf", False))
    predict = make_predict(po, dtype, sqrt_mode)
    prepare = make_prepare_track_update(
        po, derived.imu_to_camera, derived.second_imu_to_camera, use_stereo, d, dtype)
    # per-keyframe stereo pre-triangulation + information-weighted fusion
    # (reference: useIndependentStereoTriangulation, backend.cpp:927-942 and
    # triangulation.cpp:409-608; storage parity: ekf_state_index.hpp:26-78)
    use_indep_stereo = use_stereo and bool(po.useIndependentStereoTriangulation)

    def focal_thresholds(camera0):
        """(visual_r, rmse_thr0, chi_r0) scaled by the focal length — static
        floats normally; traced scalars when a dynamic per-frame camera is in
        play (varying intrinsics: the measurement noise in normalized
        coordinates scales with the CURRENT lens focal)."""
        if camera0 is None:
            f = float(_focal(cameras[0]))
        else:
            f = ((camera0.fx + camera0.fy) * 0.5).astype(dtype)
        visual_r = po.visualR / f
        rmse_thr0 = po.trackRmseThreshold / f if po.trackRmseThreshold >= 0 else -1.0
        chi_r0 = po.trackChiTestOutlierR / f if po.trackChiTestOutlierR >= 0 else -1.0
        return visual_r, rmse_thr0, chi_r0

    def stereo_args(trail_state, slot):
        """Per-track stereo idp/cov/valid rows for prepare()."""
        if not use_indep_stereo:
            return {}
        return dict(
            stereo_idp=trail_state.kf_stereo_idp[:, slot],
            stereo_cov=trail_state.kf_stereo_cov[:, slot],
            stereo_valid=trail_state.kf_stereo_valid[:, slot])

    def init_fn(rng_key=None) -> BackendState:
        return BackendState(
            ekf=init_state(po, dtype, sqrt_mode),
            trail=tr.init_trail(po, T, n_cams, dtype),
            blacklist_flags=jnp.zeros((T,), dtype=bool),
            blacklist_ids=jnp.full((T,), -1, dtype=jnp.int32),
            frames_since_keyframe=jnp.zeros((), jnp.int32),
            orientation_initialized=jnp.zeros((), bool),
            vu_window=jnp.zeros((W,), dtype=dtype),
            vu_window_t=jnp.full((W,), -jnp.inf, dtype=dtype),
            vu_window_count=jnp.zeros((), jnp.int32),
            vu_window_pos=jnp.zeros((), jnp.int32),
            tracking_status=jnp.asarray(STATUS_INIT, jnp.int32),
            rng=rng_key if rng_key is not None else jax.random.PRNGKey(po.rngSeed),
            frame_number=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------ IMU
    def imu_scan(state: BackendState, batch: ImuBatch) -> BackendState:
        def body(s, inp):
            t, g, a, valid = inp

            def process(s):
                ekf = s.ekf
                ekf = jax.lax.cond(
                    s.orientation_initialized,
                    lambda e: e,
                    lambda e: initialize_orientation(e, a, po.noiseInitialOri, noise_scale, sqrt_mode),
                    ekf,
                )
                ekf = predict(ekf, t, g, a)
                # normalize current quaternion (reference: backend.cpp:736)
                q = ekf.m[ORI:ORI + 4]
                ekf = ekf._replace(m=ekf.m.at[ORI:ORI + 4].set(q / jnp.linalg.norm(q)))
                if po.useDecayingZeroVelocityUpdate:
                    ekf = update_zupt_initialization(ekf, po.initZuptR, noise_scale, sqrt_mode)
                if po.usePseudoVelocity:
                    h = jnp.linalg.norm(ekf.m[VEL:VEL + 2])
                    ekf = jax.lax.cond(
                        h > po.pseudoVelocityLimit,
                        lambda e: update_pseudo_velocity(e, po.pseudoVelocityTarget, po.pseudoVelocityR, noise_scale, sqrt_mode),
                        lambda e: e,
                        ekf,
                    )
                return s._replace(ekf=ekf, orientation_initialized=jnp.ones((), bool))

            return jax.lax.cond(valid, process, lambda s_: s_, s), None

        state, _ = jax.lax.scan(
            body, state, (batch.t, batch.gyro, batch.acc, batch.valid),
            unroll=4)  # fuse tiny per-sample TPU loop iterations
        return state

    # --------------------------------------------------------- visual update
    def gather_pose_states(m):
        """(K,7) pose states: row 0 = current pose, row k = trail pose k-1."""
        cur = jnp.concatenate([m[POS:POS + 3], m[ORI:ORI + 4]])
        trail_block = m[CAM:CAM + POSE_DIM * L].reshape(L, POSE_DIM)
        return jnp.concatenate([cur[None, :], trail_block], axis=0)

    @_highest_precision
    def visual_update_phase(state: BackendState, track_ids, norm_pts, valid,
                            rng, full_visual_update, camera0=None):
        trail_state = state.trail
        ekf = state.ekf

        # --- candidate scoring & ordering (reference: backend.cpp:961-1010) ---
        exists_head = tr.feature_exists(trail_state, track_ids)  # (K, T)
        scores = tr.track_scores(trail_state, track_ids, sampling)  # (T,)
        # per-track pose selections (GAP/ALL are deterministic; RANDOM uses keys)
        rng, sel_key = jax.random.split(rng)
        sel_keys = jax.random.split(sel_key, T)
        select_all = jax.vmap(
            lambda slot, key: tr.select_track_poses(
                trail_state, slot, track_ids, sampling, key, po.randomTrackSamplingRatio),
            out_axes=(0, 0),
        )(jnp.arange(T), sel_keys)
        selected_all, exists_all = select_all  # (T, K) each
        n_sel = jnp.sum(selected_all, axis=1)  # (T,)

        is_map_point = jnp.zeros((T,), dtype=bool)
        mp_index_of_track = jnp.full((T,), -1, jnp.int32)
        if M > 0:
            mp_ids = trail_state.map_point_ids  # (M,)
            hits = (track_ids[:, None] == mp_ids[None, :]) & (track_ids[:, None] >= 0)
            is_map_point = jnp.any(hits, axis=1)
            mp_index_of_track = jnp.where(
                is_map_point, jnp.argmax(hits, axis=1), -1).astype(jnp.int32)

        # blacklist carry-over by id match (reference: backend.cpp:1041-1053)
        was_blacklisted = state.blacklist_flags & (state.blacklist_ids == track_ids) & valid

        cand = valid & exists_head[0]
        if po.scoreVisualUpdateTracks:
            # median score over candidates (reference uses the sorted middle)
            cscores = jnp.where(cand, scores, jnp.inf)
            n_cand = jnp.sum(cand)
            sorted_scores = jnp.sort(cscores)
            min_score = jnp.where(
                n_cand > 0, sorted_scores[jnp.clip(n_cand // 2, 0, T - 1)], -1.0)
        else:
            min_score = -jnp.inf
        if po.scoreVisualUpdateTracks:
            ok_score = (scores >= min_score) | is_map_point
        else:
            ok_score = jnp.ones((T,), bool)
        ok_len = (n_sel >= po.trackMinFrames) | is_map_point
        if not full_visual_update:
            ok_lite = is_map_point
        else:
            ok_lite = jnp.ones((T,), bool)
        eligible = cand & ok_score & ok_len & ok_lite & ~was_blacklisted

        # random iteration order, map points first (reference: shuffle + stable
        # partition, backend.cpp:963-975)
        rng, perm_key = jax.random.split(rng)
        noise = jax.random.uniform(perm_key, (T,), dtype=dtype)
        priority = (
            jnp.where(eligible, 0.0, 10.0)
            + jnp.where(is_map_point, 0.0, 1.0)
            + noise * 0.5
        )
        order = jnp.argsort(priority)[:NV]  # (NV,) slot indices

        visual_r, rmse_thr0, chi_r0 = focal_thresholds(camera0)

        # --- the sequential per-track update scan ---
        def body(carry, slot):
            (m, P, kf_used, mp_ids_arr, attempts, successes,
             rmse_thr, chi_r, bl_flags, bl_ids) = carry
            tstate = trail_state._replace(kf_used=kf_used, map_point_ids=mp_ids_arr)

            active = eligible[slot]
            mp = is_map_point[slot]
            need_more = ((po.maxSuccessfulVisualUpdates <= 0) | (successes < po.maxSuccessfulVisualUpdates)) & \
                        ((po.maxVisualUpdates <= 0) | (attempts < po.maxVisualUpdates))

            sel = selected_all[slot]  # (K,)
            pose_states = gather_pose_states(m)
            # masked poses fall back to the current pose to keep math finite
            ps = jnp.where(sel[:, None], pose_states, pose_states[0][None, :])
            trail_index = jnp.arange(K, dtype=jnp.int32)
            ips = trail_state.kf_norm[:, slot]  # (K, C, 2)
            ips = jnp.swapaxes(ips, 0, 1).reshape(n_cams * K, 2)
            vels = jnp.swapaxes(trail_state.kf_vel[:, slot], 0, 1).reshape(n_cams * K, 2)

            if M > 0:
                mp_idx = mp_index_of_track[slot]
                mp_off = jnp.where(
                    mp, d - 3 * M + 3 * jnp.maximum(mp_idx, 0), d)  # d -> dropped
                mp_val = jax.lax.dynamic_slice(
                    m, (jnp.clip(mp_off, 0, d - 3),), (3,))
                out = prepare(ps, trail_index, ips, vels, sel,
                              map_point=jnp.where(mp, mp_val, jnp.zeros(3, dtype)),
                              map_point_offset=jnp.where(mp, mp_off, d),
                              **stereo_args(trail_state, slot))
                out_tri = prepare(ps, trail_index, ips, vels, sel,
                                  **stereo_args(trail_state, slot))
                # choose between hybrid and triangulated forms
                out = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(mp, a, b), out, out_tri)
            else:
                out = prepare(ps, trail_index, ips, vels, sel,
                              **stereo_args(trail_state, slot))

            tri_ok = (out.tri_status == TRI_OK) | mp
            prep_ok = out.prepare_status == 0
            do_update = active & need_more & tri_ok & prep_ok

            res = visual_track_update(
                m, P, out.H, out.f, out.y, out.row_mask,
                visual_r, noise_scale, chi_r, rmse_thr,
                apply_update=do_update, sqrt_mode=sqrt_mode)

            inlier = res.is_inlier & do_update
            applied = inlier

            # hybrid map point promotion (reference: backend.cpp:1163-1168)
            if M > 0:
                promote = inlier & ~mp & (n_sel[slot] >= po.trackMinFrames)
                mp_slot_idx, tstate2 = tr.offer_map_point(tstate, track_ids[slot])
                can_promote = promote & (mp_slot_idx >= 0)
                mp_ids_new = jnp.where(can_promote, tstate2.map_point_ids, mp_ids_arr)
                off = d - 3 * M + 3 * jnp.maximum(mp_slot_idx, 0)
                ekf_tmp = EKFState(m=res.m, P=res.P, time=ekf.time,
                                   prev_sample_t=ekf.prev_sample_t,
                                   first_sample_t=ekf.first_sample_t,
                                   got_first_sample=ekf.got_first_sample,
                                   zupt_time=ekf.zupt_time, zrupt_time=ekf.zrupt_time,
                                   init_zupt_time=ekf.init_zupt_time,
                                   was_stationary=ekf.was_stationary,
                                   augment_count=ekf.augment_count,
                                   pose_times=ekf.pose_times)
                ekf_ins = insert_map_point(ekf_tmp, off, out.pf, sqrt_mode)
                # when promoting: skip the regular EKF update, insert instead
                m_new = jnp.where(can_promote, ekf_ins.m, res.m)
                P_new = jnp.where(can_promote, ekf_ins.P, res.P)
            else:
                mp_ids_new = mp_ids_arr
                m_new, P_new = res.m, res.P

            # mark used (reference: markTrackUsed after successful update)
            tstate_used = tr.mark_track_used(
                tstate, slot, sel, sampling, track_ids)
            kf_used_new = jnp.where(applied, tstate_used.kf_used, kf_used)

            # outlier -> grow thresholds + blacklist (reference: backend.cpp:1189-1214)
            outlier = do_update & ~res.is_inlier
            growth = po.trackOutlierThresholdGrowthFactor
            rmse_thr = jnp.where(outlier & (rmse_thr >= 0), rmse_thr * growth, rmse_thr)
            chi_r = jnp.where(outlier & (chi_r >= 0), chi_r * growth, chi_r)
            should_blacklist = active & need_more & ~inlier & po.blacklistTracks
            bl = should_blacklist
            bl_flags = bl_flags.at[slot].set(bl_flags[slot] | bl)
            bl_ids = bl_ids.at[slot].set(jnp.where(bl, track_ids[slot], bl_ids[slot]))

            attempts = attempts + jnp.where(active & ~mp & need_more, 1, 0)
            successes = successes + jnp.where(inlier, 1, 0)

            pc_point = jnp.where(active & (tri_ok | mp), out.pf, jnp.zeros(3, dtype))
            pc_status = jnp.where(
                ~active, PF_UNUSED,
                jnp.where(mp, PF_HYBRID,
                          jnp.where(inlier, PF_POSE_TRAIL,
                                    jnp.where(do_update, PF_OUTLIER, PF_UNUSED))))
            pc_valid = active & (tri_ok | mp)
            pc_id = jnp.where(pc_valid, track_ids[slot], -1)

            carry = (m_new, P_new, kf_used_new, mp_ids_new, attempts, successes,
                     rmse_thr, chi_r, bl_flags, bl_ids)
            return carry, (pc_point, pc_status.astype(jnp.int32), pc_id,
                           out.tri_status.astype(jnp.int32),
                           out.prepare_status.astype(jnp.int32))

        init_carry = (
            ekf.m, ekf.P, trail_state.kf_used, trail_state.map_point_ids,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            jnp.asarray(rmse_thr0, dtype), jnp.asarray(chi_r0, dtype),
            jnp.zeros((T,), bool), jnp.full((T,), -1, jnp.int32),
        )
        carry, (pc_points, pc_status, pc_ids, vu_tri, vu_prep) = jax.lax.scan(
            body, init_carry, order)
        (m, P, kf_used, mp_ids_arr, attempts, successes, _, _, bl_flags, bl_ids) = carry

        # blacklisted-last-frame tracks stay blacklisted until the tracker
        # replaces them (reference: backend.cpp:1046-1050)
        if po.blacklistTracks:
            bl_flags = bl_flags | was_blacklisted
            bl_ids = jnp.where(was_blacklisted, track_ids, bl_ids)

        # symmetrize once per frame (reference: backend.cpp:1265-1267);
        # the square-root factor is PSD by construction and not symmetric
        if not sqrt_mode:
            P = 0.5 * (P + P.T)
        ekf = ekf._replace(m=m, P=P)
        trail_state = trail_state._replace(kf_used=kf_used, map_point_ids=mp_ids_arr)

        too_many_failures = (attempts - successes) > 5
        need_more_final = ((po.maxSuccessfulVisualUpdates <= 0) | (successes < po.maxSuccessfulVisualUpdates)) & \
                          ((po.maxVisualUpdates <= 0) | (attempts < po.maxVisualUpdates))
        state = state._replace(ekf=ekf, trail=trail_state, rng=rng,
                               blacklist_flags=bl_flags, blacklist_ids=bl_ids)
        return (state, (pc_points, pc_status, pc_ids, vu_tri, vu_prep),
                need_more_final, too_many_failures)

    @_highest_precision
    def visual_update_phase_batched(state: BackendState, track_ids, norm_pts,
                                    valid, rng, full_visual_update,
                                    camera0=None):
        """Batched visual update (reference: batchVisualUpdate mode,
        backend.cpp:1005-1010,1170-1187): all candidate tracks triangulate and
        gate in PARALLEL against the same pre-update state, and the accepted
        blocks apply as ONE stacked EKF update. On TPU this replaces NV
        sequential small steps by one wide program -- the main throughput
        lever for the per-frame latency. Hybrid map-point tracks join the
        stack with their map-point H columns (full-width H makes this free);
        promotions are excluded from the stack and applied afterwards as one
        vectorized insert, mirroring the sequential skip-update-and-insert
        semantics (backend.cpp:1163-1168)."""
        trail_state = state.trail
        ekf = state.ekf

        exists_head = tr.feature_exists(trail_state, track_ids)
        scores = tr.track_scores(trail_state, track_ids, sampling)
        rng, sel_key = jax.random.split(rng)
        sel_keys = jax.random.split(sel_key, T)
        selected_all, exists_all = jax.vmap(
            lambda slot, key: tr.select_track_poses(
                trail_state, slot, track_ids, sampling, key, po.randomTrackSamplingRatio),
            out_axes=(0, 0),
        )(jnp.arange(T), sel_keys)
        n_sel = jnp.sum(selected_all, axis=1)
        was_blacklisted = state.blacklist_flags & (state.blacklist_ids == track_ids) & valid

        is_map_point = jnp.zeros((T,), dtype=bool)
        mp_index_of_track = jnp.full((T,), -1, jnp.int32)
        if M > 0:
            mp_ids0 = trail_state.map_point_ids  # (M,)
            hits = (track_ids[:, None] == mp_ids0[None, :]) & (track_ids[:, None] >= 0)
            is_map_point = jnp.any(hits, axis=1)
            mp_index_of_track = jnp.where(
                is_map_point, jnp.argmax(hits, axis=1), -1).astype(jnp.int32)

        cand = valid & exists_head[0]
        if po.scoreVisualUpdateTracks:
            cscores = jnp.where(cand, scores, jnp.inf)
            n_cand = jnp.sum(cand)
            sorted_scores = jnp.sort(cscores)
            min_score = jnp.where(
                n_cand > 0, sorted_scores[jnp.clip(n_cand // 2, 0, T - 1)], -1.0)
            ok_score = (scores >= min_score) | is_map_point
        else:
            ok_score = jnp.ones((T,), bool)
        ok_len = (n_sel >= po.trackMinFrames) | is_map_point
        eligible = cand & ok_score & ok_len & ~was_blacklisted
        if not full_visual_update:
            eligible = eligible & is_map_point

        rng, perm_key = jax.random.split(rng)
        noise = jax.random.uniform(perm_key, (T,), dtype=dtype)
        # map points first within the eligible set (reference: stable
        # partition after shuffle, backend.cpp:963-975)
        priority = (jnp.where(eligible, 0.0, 10.0)
                    + jnp.where(is_map_point, 0.0, 1.0) + noise * 0.5)
        order = jnp.argsort(priority)[:NV]
        mp_ordered = is_map_point[order]

        visual_r, rmse_thr0, chi_r0 = focal_thresholds(camera0)

        pose_states = gather_pose_states(ekf.m)
        trail_index = jnp.arange(K, dtype=jnp.int32)

        def prep_one(slot):
            sel = selected_all[slot]
            ps = jnp.where(sel[:, None], pose_states, pose_states[0][None, :])
            ips = jnp.swapaxes(trail_state.kf_norm[:, slot], 0, 1).reshape(n_cams * K, 2)
            vels = jnp.swapaxes(trail_state.kf_vel[:, slot], 0, 1).reshape(n_cams * K, 2)
            if M > 0:
                mp = is_map_point[slot]
                mp_idx = mp_index_of_track[slot]
                mp_off = jnp.where(
                    mp, d - 3 * M + 3 * jnp.maximum(mp_idx, 0), d)
                mp_val = jax.lax.dynamic_slice(
                    ekf.m, (jnp.clip(mp_off, 0, d - 3),), (3,))
                out_mp = prepare(ps, trail_index, ips, vels, sel,
                                 map_point=jnp.where(mp, mp_val, jnp.zeros(3, dtype)),
                                 map_point_offset=jnp.where(mp, mp_off, d),
                                 **stereo_args(trail_state, slot))
                out_tri = prepare(ps, trail_index, ips, vels, sel,
                                  **stereo_args(trail_state, slot))
                return jax.tree_util.tree_map(
                    lambda a, b: jnp.where(mp, a, b), out_mp, out_tri)
            return prepare(ps, trail_index, ips, vels, sel,
                           **stereo_args(trail_state, slot))

        outs = jax.vmap(prep_one)(order)  # leading axis NV
        active = eligible[order]
        tri_ok = (outs.tri_status == TRI_OK) | mp_ordered
        prep_ok = outs.prepare_status == 0

        from ..ekf import visual_track_gate

        gate_ok, chi2_vals = jax.vmap(
            lambda H, f, y, mask: visual_track_gate(
                ekf.m, ekf.P, H, f, y, mask, noise_scale, chi_r0, rmse_thr0,
                sqrt_mode=sqrt_mode)
        )(outs.H, outs.f, outs.y, outs.row_mask)

        # every active non-map-point candidate triangulates; map-point
        # updates don't count against the attempt budget (reference:
        # backend.cpp attempts counting excludes hybrid tracks)
        attempt = active & ~mp_ordered
        attempts_before = jnp.cumsum(attempt) - attempt.astype(jnp.int32)
        inlier_raw = active & tri_ok & prep_ok & gate_ok
        successes_before = jnp.cumsum(inlier_raw) - inlier_raw.astype(jnp.int32)
        need_more = jnp.ones((NV,), bool)
        if po.maxVisualUpdates > 0:
            need_more = need_more & (attempts_before < po.maxVisualUpdates)
        if po.maxSuccessfulVisualUpdates > 0:
            need_more = need_more & (successes_before < po.maxSuccessfulVisualUpdates)
        accepted = inlier_raw & need_more
        attempted = attempt & need_more

        # hybrid map promotion: accepted non-map-point tracks claim free map
        # slots in order; promoted tracks skip the stacked update and are
        # inserted with a weak prior instead (reference: backend.cpp:1163-1168
        # + insertMapPoint semantics)
        can_promote = jnp.zeros((NV,), bool)
        mp_ids_arr = trail_state.map_point_ids if M > 0 else None
        if M > 0:
            free = mp_ids_arr < 0  # (M,)
            n_free = jnp.sum(free)
            free_slots = jnp.argsort(~free, stable=True)  # free first
            promote_cand = accepted & ~mp_ordered
            promo_rank = jnp.cumsum(promote_cand) - promote_cand.astype(jnp.int32)
            can_promote = promote_cand & (promo_rank < n_free)
            mp_slot_of = free_slots[jnp.clip(promo_rank, 0, M - 1)]  # (NV,)
        accepted_stack = accepted & ~can_promote

        # stack the first A_cap accepted tracks into one update; with
        # maxSuccessfulVisualUpdates <= 0 the contract is "unlimited", so cap
        # only at the candidate width (round-1 silently capped at 8)
        A_cap = po.maxSuccessfulVisualUpdates if po.maxSuccessfulVisualUpdates > 0 else NV
        acc_idx = jnp.argsort(~accepted_stack, stable=True)[:A_cap]
        acc_ok = accepted_stack[acc_idx]
        rows = outs.H.shape[1]
        # batchVisualUpdateMaxSizeMultiplier bounds ONE stacked update to
        # stateDim * multiplier rows; overflow is flushed as additional
        # sequential batched updates, not dropped (reference:
        # backend.cpp:1001,1172-1183 flush-and-continue)
        per_chunk = max(int(d * po.batchVisualUpdateMaxSizeMultiplier + 0.5) // max(rows, 1), 1)
        n_chunks = (A_cap + per_chunk - 1) // per_chunk
        m, P = ekf.m, ekf.P
        for ci in range(n_chunks):
            sl = slice(ci * per_chunk, min((ci + 1) * per_chunk, A_cap))
            idx_c = acc_idx[sl]
            ok_c = acc_ok[sl]
            n_c = idx_c.shape[0]
            H_big = (outs.H[idx_c] * ok_c[:, None, None]).reshape(n_c * rows, d)
            f_big = (outs.f[idx_c] * ok_c[:, None]).reshape(-1)
            y_big = (outs.y[idx_c] * ok_c[:, None]).reshape(-1)
            mask_big = (outs.row_mask[idx_c] & ok_c[:, None]).reshape(-1)
            res = visual_track_update(
                m, P, H_big, f_big, y_big, mask_big,
                visual_r, noise_scale, chi_outlier_r=-1.0, rmse_threshold=-1.0,
                apply_update=jnp.any(ok_c), sqrt_mode=sqrt_mode)
            m, P = res.m, res.P

        if M > 0:
            # vectorized inserts: one masked covariance reset + mean write
            # for ALL promoted slots (equivalent to insert_map_point per
            # slot; the blocks are disjoint)
            offs = d - 3 * M + 3 * mp_slot_of  # (NV,)
            idx = jnp.arange(d)
            in_block = jnp.any(
                can_promote[:, None]
                & (idx[None, :] >= offs[:, None])
                & (idx[None, :] < offs[:, None] + 3), axis=0)  # (d,)
            keep = (~in_block).astype(dtype)
            NOISE = 1e3
            block_var = jnp.where(in_block, NOISE * NOISE, 0.0).astype(dtype)
            if sqrt_mode:
                # zero the factor rows (=> zero P rows+cols) and fold the new
                # block prior in as appended diagonal columns under one QR
                from ..ekf.sqrt import sr_add_diag_noise

                P_ins = sr_add_diag_noise(P * keep[:, None], block_var)
            else:
                P_ins = P * (keep[:, None] * keep[None, :]) + jnp.diag(block_var)
            m_ins = jnp.where(in_block, jnp.zeros_like(m), m)
            # scatter the triangulated points into their blocks
            put = jnp.zeros((d,), dtype)
            for ci in range(3):
                put = put.at[jnp.where(can_promote, offs + ci, d)].add(
                    jnp.where(can_promote, outs.pf[:, ci], 0.0), mode="drop")
            m_ins = m_ins + put
            do_ins = jnp.any(can_promote)
            m = jnp.where(do_ins, m_ins, m)
            P = jnp.where(do_ins, P_ins, P)
            # claim the slots
            mp_ids_arr = mp_ids_arr.at[
                jnp.where(can_promote, mp_slot_of, M)].set(
                jnp.where(can_promote, track_ids[order], -1), mode="drop")
        if not sqrt_mode:
            P = 0.5 * (P + P.T)

        # mark used for accepted tracks (vectorized GAP marking)
        accepted_per_slot = jnp.zeros((T,), bool).at[order].set(accepted, mode="drop")
        if sampling == tr.SAMPLING_GAP:
            exists_full = tr.feature_exists(trail_state, track_ids)  # (K,T)
            kf_used = trail_state.kf_used | (exists_full & accepted_per_slot[None, :])
        elif sampling == tr.SAMPLING_RANDOM:
            kf_used = trail_state.kf_used | (selected_all.T & accepted_per_slot[None, :])
        else:
            kf_used = trail_state.kf_used

        # blacklist: attempted-but-rejected tracks
        rejected = attempted & ~inlier_raw
        bl_flags = jnp.zeros((T,), bool).at[order].set(rejected, mode="drop")
        if po.blacklistTracks:
            bl_flags = bl_flags | was_blacklisted
        bl_ids = jnp.where(bl_flags, track_ids, -1)

        n_attempts = jnp.sum(attempted)
        n_success = jnp.sum(accepted)
        pc_valid = active & tri_ok
        pc_points = jnp.where(pc_valid[:, None], outs.pf, 0.0)
        pc_status = jnp.where(
            ~active, PF_UNUSED,
            jnp.where(mp_ordered, PF_HYBRID,
                      jnp.where(accepted, PF_POSE_TRAIL,
                                jnp.where(attempted & ~inlier_raw,
                                          PF_OUTLIER, PF_UNUSED)))).astype(jnp.int32)
        pc_ids = jnp.where(pc_valid, track_ids[order], -1)

        too_many_failures = (n_attempts - n_success) > 5
        need_more_final = ((po.maxSuccessfulVisualUpdates <= 0) | (n_success < po.maxSuccessfulVisualUpdates)) & \
                          ((po.maxVisualUpdates <= 0) | (n_attempts < po.maxVisualUpdates))
        new_trail = trail_state._replace(kf_used=kf_used)
        if M > 0:
            new_trail = new_trail._replace(map_point_ids=mp_ids_arr)
        state = state._replace(
            ekf=ekf._replace(m=m, P=P),
            trail=new_trail,
            rng=rng, blacklist_flags=bl_flags, blacklist_ids=bl_ids)
        return (state,
                (pc_points, pc_status, pc_ids,
                 outs.tri_status.astype(jnp.int32),
                 outs.prepare_status.astype(jnp.int32)),
                need_more_final, too_many_failures)

    use_batched = bool(getattr(po, "batchVisualUpdate", False))

    # ------------------------------------------------------------- the step
    def process_frame(state: BackendState, tracker_in: TrackerInput,
                      camera0=None):
        ekf = state.ekf
        t_frame = ekf.prev_sample_t

        frame_number = state.frame_number + 1
        state = state._replace(frame_number=frame_number)

        full_visual_update = True
        if po.visualUpdateForEveryNFrame > 1:
            full_visual_update = (frame_number % po.visualUpdateForEveryNFrame) == 0

        # keyframe & stationarity accounting (reference: backend.cpp:763-790)
        keyframe = tracker_in.keyframe
        frames_since_kf = jnp.where(keyframe, 0, state.frames_since_keyframe + 1)
        stationary_visual = frames_since_kf >= po.visualStationarityFrameCountThreshold
        ekf = state.ekf
        if po.useVisualStationarity:
            ekf = jax.lax.cond(
                stationary_visual,
                lambda e: update_zupt(e, po.visualZuptR, noise_scale, sqrt_mode),
                lambda e: e, ekf)
        state = state._replace(ekf=ekf, frames_since_keyframe=frames_since_kf)

        if isinstance(full_visual_update, bool):
            keyframe_eff = keyframe if full_visual_update else jnp.zeros((), bool)
        else:
            keyframe_eff = keyframe & full_visual_update

        # non-keyframe: drop head keyframe + undo augmentation
        def drop_head(st):
            return st._replace(
                trail=tr.pop_head_keyframe(st.trail),
                ekf=undo_augmentation(st.ekf, L, M, sqrt_mode),
            )

        if po.visualUpdateEnabled:
            state = jax.lax.cond(keyframe_eff, lambda st: st, drop_head, state)

            # normalize current pixels & insert into head keyframe
            norm0, ok0 = normalize_pixel(
                camera0 if camera0 is not None else cameras[0],
                tracker_in.pixels[:, 0, :])
            if use_stereo:
                norm1, ok1 = normalize_pixel(cameras[1], tracker_in.pixels[:, 1, :])
                norm = jnp.stack([norm0, norm1], axis=1)
                ok = ok0 & ok1
            else:
                norm = norm0[:, None, :]
                ok = ok0
            valid = (tracker_in.track_ids >= 0) & ok

            stereo_kwargs = {}
            if use_indep_stereo:
                # pre-triangulate each track's stereo pair in the head
                # keyframe's own camera (reference: backend.cpp:927-942 via
                # triangulateStereoFeatureIdp); dense depth, when available,
                # replaces the range but keeps the triangulation sensitivity
                # covariance (backend.cpp:936-941)
                from .triangulation import inverse_depth, triangulate_stereo_idp

                s2f = jnp.asarray(
                    np.asarray(derived.imu_to_camera)
                    @ np.linalg.inv(np.asarray(derived.second_imu_to_camera)),
                    dtype)
                sidp, scov, sok = jax.vmap(
                    lambda a, b: triangulate_stereo_idp(a, b, s2f))(
                        norm0.astype(dtype), norm1.astype(dtype))
                dd = tracker_in.stereo_depth.astype(dtype)
                pf3 = inverse_depth(sidp)
                # dd from disparity_to_depth is Z-DEPTH (p.z/w), not range:
                # rescale so the z component equals dd (scaling to |p|=dd
                # would underestimate depth by 1/cos(theta) off-axis)
                z = pf3[:, 2:3]
                pf3_d = pf3 * (dd[:, None] / jnp.where(jnp.abs(z) > 1e-9, z, 1.0))
                sidp_dd = inverse_depth(pf3_d)
                use_dd = ((dd > 0) & sok & (jnp.abs(pf3[:, 2]) > 1e-9)
                          & jnp.all(jnp.isfinite(sidp_dd), axis=-1))
                sidp = jnp.where(use_dd[:, None], sidp_dd, sidp)
                stereo_kwargs = dict(
                    stereo_idp=sidp, stereo_cov=scov,
                    stereo_valid=sok & valid & jnp.all(jnp.isfinite(sidp), axis=-1))

            trail_state = tr.insert_head_features(
                state.trail, tracker_in.track_ids, norm,
                tracker_in.pixels[:, 0, :], valid, timestamp=t_frame,
                estimate_velocities=bool(po.estimateImuCameraTimeShift),
                **stereo_kwargs)
            trail_state = trail_state._replace(
                kf_frame_num=trail_state.kf_frame_num.at[0].set(frame_number))
            trail_state = tr.prune(trail_state, jnp.where(valid, tracker_in.track_ids, -1))
            state = state._replace(trail=trail_state)

            rng, vu_rng = jax.random.split(state.rng)
            state = state._replace(rng=rng)
            vu_fn = visual_update_phase_batched if use_batched else visual_update_phase
            state, pc, need_more, too_many_failures = vu_fn(
                state, jnp.where(valid, tracker_in.track_ids, -1), norm, valid,
                vu_rng, True, camera0=camera0)

            good_frame = (stationary_visual | ~need_more) & ~too_many_failures

            # push new head keyframe + EKF augmentation
            removed, counter = tr.removed_keyframe_index(
                state.trail, jnp.where(valid, tracker_in.track_ids, -1), po)
            trail_state = state.trail._replace(frame_counter=counter)
            trail_state = tr.push_head_keyframe(trail_state, removed, frame_number, t_frame)
            ekf = augment_pose(state.ekf, removed - 1, po, sqrt_mode)
            state = state._replace(ekf=ekf, trail=trail_state)

            # tracking status from the good-frame window. The reference's
            # CircularBuffer (backend.cpp:195-197,806-819) is frame-count
            # based assuming targetFps; the TIME mask here restricts the
            # mean to entries within goodFramesTimeWindowSeconds so the
            # window stays correct when the actual frame rate differs.
            vu_window = state.vu_window.at[state.vu_window_pos].set(
                jnp.where(good_frame, 1.0, 0.0))
            vu_window_t = state.vu_window_t.at[state.vu_window_pos].set(t_frame)
            pos_ = (state.vu_window_pos + 1) % W
            count = jnp.minimum(state.vu_window_count + 1, W)
            in_window = vu_window_t >= t_frame - po.goodFramesTimeWindowSeconds
            n_in = jnp.sum(in_window)
            mean_vu = (jnp.sum(jnp.where(in_window, vu_window, 0.0))
                       / jnp.maximum(n_in, 1))
            # arm the hysteresis like the reference (entries > nominal
            # buffer / 2 at targetFps), OR once the recorded history spans
            # the full time window (slower-than-target frame rates would
            # otherwise wait several windows before arming)
            t_oldest = jnp.min(jnp.where(vu_window_t > -jnp.inf,
                                         vu_window_t, jnp.inf))
            span_ok = (count > 1) & (
                t_frame - t_oldest >= po.goodFramesTimeWindowSeconds)
            enough = (count > W_arm // 2) | span_ok
            status = state.tracking_status
            status = jnp.where(
                enough & (status != STATUS_TRACKING) & (mean_vu > po.goodFramesToTracking),
                STATUS_TRACKING, status)
            status = jnp.where(
                enough & (status == STATUS_TRACKING) & (mean_vu < po.goodFramesToTrackingFailed),
                STATUS_LOST_TRACKING, status)
            state = state._replace(
                vu_window=vu_window, vu_window_t=vu_window_t,
                vu_window_pos=pos_, vu_window_count=count,
                tracking_status=status.astype(jnp.int32))
        else:
            pc = (jnp.zeros((NV, 3), dtype), jnp.zeros((NV,), jnp.int32),
                  jnp.full((NV,), -1, jnp.int32), jnp.zeros((NV,), jnp.int32),
                  jnp.zeros((NV,), jnp.int32))
            good_frame = jnp.zeros((), bool)

        ekf = state.ekf
        n_cams_in = tracker_in.pixels.shape[1]
        viz_status = (tracker_in.track_status
                      if tracker_in.track_status is not None
                      else jnp.full((T,), -1, jnp.int32))
        viz_prev = (tracker_in.prev_pixels
                    if tracker_in.prev_pixels is not None
                    else jnp.zeros((T, n_cams_in, 2), tracker_in.pixels.dtype))
        viz_px = (tracker_in.viz_pixels
                  if tracker_in.viz_pixels is not None
                  else tracker_in.pixels)
        out = FrameOutput(
            t=t_frame,
            position=ekf.m[POS:POS + 3],
            velocity=ekf.m[VEL:VEL + 3],
            orientation=ekf.m[ORI:ORI + 4],
            bias_gyro=ekf.m[BGA:BGA + 3],
            bias_acc=ekf.m[13:16],
            position_cov=(cov_block(ekf.P, slice(POS, POS + 3)) if sqrt_mode
                          else ekf.P[POS:POS + 3, POS:POS + 3]),
            velocity_cov=(cov_block(ekf.P, slice(VEL, VEL + 3)) if sqrt_mode
                          else ekf.P[VEL:VEL + 3, VEL:VEL + 3]),
            bias_cov_diag=(cov_diag(ekf.P)[BGA:BGA + 9] if sqrt_mode
                           else jnp.diagonal(ekf.P)[BGA:BGA + 9]),
            tracking_status=state.tracking_status,
            stationary_visual=stationary_visual,
            point_cloud=pc[0],
            point_cloud_status=pc[1],
            point_cloud_ids=pc[2],
            pose_trail=ekf.m[CAM:CAM + POSE_DIM * L].reshape(L, POSE_DIM),
            pose_trail_times=ekf.pose_times,
            good_frame=good_frame,
            keyframe=keyframe,
            track_ids=state.trail.kf_track_id[1],
            track_norm=state.trail.kf_norm[1, :, 0, :],
            track_depth=tracker_in.stereo_depth,
            track_status=viz_status,
            track_prev_pixels=viz_prev,
            track_pixels=viz_px,
            vu_tri_status=pc[3],
            vu_prepare_status=pc[4],
            sft=ekf.m[SFT],
        )
        return state, out

    def frame_step(state: BackendState, imu: ImuBatch, tracker_in: TrackerInput):
        return process_frame(imu_scan(state, imu), tracker_in)

    # expose the pieces for fused front-end integration (odometry/vio.py)
    frame_step.imu_scan = imu_scan
    frame_step.process_frame = process_frame
    return init_fn, frame_step


def _focal(cam: Camera) -> float:
    return float(np.asarray(cam.fx) + np.asarray(cam.fy)) * 0.5
