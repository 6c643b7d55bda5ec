"""Full VIO: image front-end + odometry backend fused into one jitted step.

Mirrors the reference Session::process flow (reference: backend.cpp:716-867)
including the odometry-predicted optical flow initial guesses (reference:
applyTracker's opticalFlowPredictor lambda, backend.cpp:541-663): per track,
estimate the feature distance by widest-baseline two-view triangulation over
the pose trail (clamped to predictOpticalFlowMinTriangulationDistance),
unproject the previous corner at that distance, and reproject with the current
EKF pose.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ekf import CAM, ORI, POS, POSE_DIM
from ..frontend.tracker import TrackerState, make_tracker
from ..geometry.cameras import pixel_to_ray, ray_to_pixel
from ..geometry.poses import to_camera_to_world, to_world_to_camera, transform_vec3
from . import trail as tr
from .backend import BackendState, FrameOutput, ImuBatch, TrackerInput, make_backend
from .triangulation import triangulate_two_cameras, camera_poses_from_states


class VioState(NamedTuple):
    backend: BackendState
    tracker: TrackerState
    tracker_ready: jnp.ndarray  # () bool


def make_vio(params, derived, cameras, max_tracks=None, dtype=None,
             image_dtype=jnp.float32):
    """Build (init_fn(first_image), vio_step(state, imu_batch, image)).

    dtype=None resolves to float64 when JAX x64 is enabled (the reference
    filter's precision, ekf.cpp) and float32 otherwise — requesting f64
    without x64 would silently truncate to f32 with per-site warnings."""
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    po = params.odometry
    pt = params.tracker
    T = max_tracks if max_tracks is not None else pt.maxTracks
    L = po.cameraTrailLength
    K = L + 1
    i2c = jnp.asarray(derived.imu_to_camera, dtype=dtype)

    use_stereo = bool(pt.useStereo)

    # --- optional stereo rectification of the input images (reference:
    # tracker.useRectification; Image::Factory::buildStereo builds a
    # StereoRectifier + two Undistorters, image.cpp:310-338). The tracker and
    # backend then operate on rectified pinhole cameras CARRYING the
    # rectification rotation (camera.cpp:158-162), so normalized points /
    # rays remain in the original cam0/cam1 frames and the filter extrinsics
    # are unchanged. ---
    use_rectification = use_stereo and bool(pt.useRectification)
    input_remaps = None
    Q_rectified = None
    if use_rectification:
        from ..frontend.rectify import build_remap, stereo_rectify

        img_w = int(np.asarray(cameras[0].width))
        img_h = int(np.asarray(cameras[0].height))
        rc0, rc1, Q_rectified, _, _ = stereo_rectify(
            cameras[0], cameras[1], np.asarray(derived.imu_to_camera),
            np.asarray(derived.second_imu_to_camera), img_w, img_h,
            zoom=pt.rectificationZoom, dtype=image_dtype)
        input_remaps = (build_remap(cameras[0], rc0, img_w, img_h),
                        build_remap(cameras[1], rc1, img_w, img_h))
        cameras = (rc0, rc1)

    cam0 = cameras[0]
    backend_init, frame_step = make_backend(
        params, derived, cameras, max_tracks=T, dtype=dtype)
    tracker_init, track_frame = make_tracker(
        params, cameras, max_tracks=T, dtype=image_dtype, derived=derived)

    def normalize_input(img):
        """Integer-dtype frames normalize to [0,1] ON DEVICE.

        Shipping uint8 over the host->device link costs 1/4 the bytes of
        pre-normalized float32 — the reference likewise ingests 8-bit frames
        and converts in the processing pipeline (image.cpp:345-367). jit
        specializes on the traced input dtype, so the same step function
        serves float (pre-normalized) and integer (raw camera) callers."""
        if img is None:
            return None
        img = jnp.asarray(img)
        if jnp.issubdtype(img.dtype, jnp.integer):
            img = img.astype(image_dtype) * jnp.asarray(1.0 / 255.0, image_dtype)
        return img

    def rectify_inputs(image, second_image):
        if input_remaps is None:
            return image, second_image
        from ..frontend.rectify import remap

        return (remap(jnp.asarray(image, image_dtype), input_remaps[0]),
                remap(jnp.asarray(second_image, image_dtype), input_remaps[1]))

    dense_depth = use_stereo and bool(pt.computeDenseStereoDepth)
    if dense_depth:
        # dense stereo depth attach (reference: Tracker::computeDenseStereoDepth,
        # tracker.cpp:784-796 — requires rectification): rectify both images,
        # block-matching disparity, Q-matrix depth sampled at track pixels
        from ..frontend.disparity import (compute_disparity,
                                          default_max_disparity,
                                          disparity_to_depth, sample_depth)
        from ..frontend.rectify import build_remap, remap, stereo_rectify

        img_w = int(np.asarray(cam0.width))
        img_h = int(np.asarray(cam0.height))
        if use_rectification:
            # inputs are already rectified by rectify_inputs
            rc0, rc1 = cameras
            Q_depth = Q_rectified
            remap0 = remap1 = None
        else:
            rc0, rc1, Q_depth, _, _ = stereo_rectify(
                cameras[0], cameras[1], np.asarray(derived.imu_to_camera),
                np.asarray(derived.second_imu_to_camera), img_w, img_h,
                zoom=pt.rectificationZoom, dtype=image_dtype)
            remap0 = build_remap(cameras[0], rc0, img_w, img_h)
            remap1 = build_remap(cameras[1], rc1, img_w, img_h)
        max_disp = default_max_disparity(img_w)

        def track_dense_depth(image, second_image, pixels, valid):
            if remap0 is not None:
                rl = remap(jnp.asarray(image, image_dtype), remap0)
                rr = remap(jnp.asarray(second_image, image_dtype), remap1)
            else:
                rl = jnp.asarray(image, image_dtype)
                rr = jnp.asarray(second_image, image_dtype)
            disp, dvalid = compute_disparity(rl, rr, max_disp)
            depth, dok = disparity_to_depth(disp, dvalid, Q_depth)
            # track pixels live in the tracker camera; map to rectified
            rays, ok_r = pixel_to_ray(cam0, pixels.astype(image_dtype))
            rpix, ok_p = ray_to_pixel(rc0, rays)
            d = sample_depth(depth, dok, rpix)
            return jnp.where(valid & ok_r & ok_p, d, -1.0).astype(dtype)

    def init_fn(first_image, t0=0.0, rng_key=None, second_image=None) -> VioState:
        if use_stereo and second_image is None and isinstance(first_image, (tuple, list)):
            first_image, second_image = first_image
        first_image = normalize_input(first_image)
        second_image = normalize_input(second_image)
        if use_rectification:
            first_image, second_image = rectify_inputs(first_image, second_image)
        return VioState(
            backend=backend_init(rng_key),
            tracker=tracker_init(first_image, t0, second_image=second_image),
            tracker_ready=jnp.ones((), bool),
        )

    def predict_flow(bstate: BackendState, tstate: TrackerState, c0=None):
        """Per-slot predicted current pixels (reference: backend.cpp:541-663)."""
        c0 = cam0 if c0 is None else c0
        m = bstate.ekf.m
        cur = jnp.concatenate([m[POS:POS + 3], m[ORI:ORI + 4]])
        trail_block = m[CAM:CAM + POSE_DIM * L].reshape(L, POSE_DIM)
        pose_states = jnp.concatenate([cur[None, :], trail_block], axis=0)  # (K,7)
        cposes = camera_poses_from_states(pose_states, i2c)

        track_ids = tstate.track_ids
        exists = tr.feature_exists(bstate.trail, track_ids)  # (K, T)
        ks = jnp.arange(K)
        k0 = jnp.min(jnp.where(exists, ks[:, None], K), axis=0)  # (T,)
        k1 = jnp.max(jnp.where(exists, ks[:, None], -1), axis=0)
        has_baseline = (k1 - k0) >= 10  # MIN_TWO_CAMERA_FLOW_TRIANGULATION_BASELINE

        slot_idx = jnp.arange(T)
        ip_k0 = bstate.trail.kf_norm[jnp.clip(k0, 0, K - 1), slot_idx, 0, :]
        ip_k1 = bstate.trail.kf_norm[jnp.clip(k1, 0, K - 1), slot_idx, 0, :]

        def tri(k0_, k1_, ip0_, ip1_):
            return triangulate_two_cameras(
                cposes.p[k0_], cposes.R[k0_], cposes.p[k1_], cposes.R[k1_], ip0_, ip1_)

        pf = jax.vmap(tri)(jnp.clip(k0, 0, K - 1), jnp.clip(k1, 0, K - 1), ip_k0, ip_k1)
        dist = jnp.where(
            has_baseline & (pf[:, 2] > 0.0), jnp.linalg.norm(pf, axis=-1), -1.0)
        dist = jnp.maximum(dist, pt.predictOpticalFlowMinTriangulationDistance)

        # unproject previous corner at pose trail slot 0 (previous frame pose),
        # reproject at the current pose
        prev_px = tstate.px[:, 0, :].astype(dtype)
        ray0, ok0 = pixel_to_ray(c0, prev_px)
        p_hist = pose_states[1, :3]
        q_hist = pose_states[1, 3:]
        cam_to_world = to_camera_to_world(p_hist, q_hist, i2c)
        world_to_cam = to_world_to_camera(m[POS:POS + 3], m[ORI:ORI + 4], i2c)
        pw = transform_vec3(cam_to_world, ray0 * dist[:, None])
        rc = transform_vec3(world_to_cam, pw)
        pix1, ok1 = ray_to_pixel(c0, rc)
        guess = jnp.where((ok0 & ok1)[:, None], pix1, prev_px)
        if not use_stereo:
            return guess.astype(jnp.float32), None
        # stereo: also reproject the same world point into the SECOND camera
        # as the left->right matching guess (reference: tracker.cpp:409-463
        # uses predicted flow for the stereo pass as well)
        i2c2 = jnp.asarray(derived.second_imu_to_camera, dtype=dtype)
        world_to_cam2 = to_world_to_camera(m[POS:POS + 3], m[ORI:ORI + 4], i2c2)
        rc2 = transform_vec3(world_to_cam2, pw)
        pix2, ok2 = ray_to_pixel(cameras[1], rc2)
        guess2 = jnp.where((ok0 & ok2)[:, None], pix2, guess)
        return guess.astype(jnp.float32), guess2.astype(jnp.float32)

    def imu_only(state: VioState, imu: ImuBatch) -> VioState:
        """Propagate the filter through an IMU batch with no frame attached.

        Lets the host process arbitrarily many pending IMU samples in
        fixed-size chunks (reference processes EVERY synced sample,
        control.cpp:79-155) instead of truncating to the last chunk. Also the
        first stage of vio_step and the '-timer' staged path.
        """
        return state._replace(backend=frame_step.imu_scan(state.backend, imu))

    def track_stage(state: VioState, t, image, second_image=None,
                    camera0=None):
        """Front-end stage: rectify + predicted flow + LK/detect/RANSAC;
        assumes IMU already propagated to the frame time. Returns
        (state, TrackerInput).

        camera0: optional dynamic per-frame Camera (varying intrinsics; mono
        only — stereo geometry constants are baked at build time)."""
        if camera0 is not None:
            assert not use_stereo and not dense_depth, \
                "varying intrinsics supported for mono only"
        if use_stereo and second_image is None and isinstance(image, (tuple, list)):
            image, second_image = image
        image = normalize_input(image)
        second_image = normalize_input(second_image)
        if use_rectification:
            image, second_image = rectify_inputs(image, second_image)
        bstate = state.backend
        if pt.predictOpticalFlow:
            guess, stereo_guess = predict_flow(bstate, state.tracker, camera0)
        else:
            guess, stereo_guess = None, None

        rng, tkey = jax.random.split(bstate.rng)
        # the tracker RANSAC stream is separately seeded (reference:
        # tracker.ransacRngSeed, ransac_pipeline.cpp/stereo_upright_2p.cpp
        # own their RNG): folding the seed in gives a deterministic stream
        # that changes when the seed parameter changes
        tkey = jax.random.fold_in(tkey, pt.ransacRngSeed)
        bstate = bstate._replace(rng=rng)
        pose_rot = None
        if use_stereo and pt.useStereoUpright2p and not pt.useRansac3:
            # camera-to-world rotations for the upright-2p RANSAC (reference:
            # ransac pipeline receives odometry poses, tracker.hpp / backend
            # applyTracker): prev = trail head pose, cur = current EKF pose
            m = bstate.ekf.m
            c2w_prev = to_camera_to_world(
                m[CAM:CAM + 3], m[CAM + 3:CAM + POSE_DIM], i2c)
            c2w_cur = to_camera_to_world(m[POS:POS + 3], m[ORI:ORI + 4], i2c)
            pose_rot = (c2w_prev[:3, :3], c2w_cur[:3, :3])
        tstate, tout = track_frame(
            state.tracker, image, tkey, t,
            flow_guess=guess,
            blacklist_flags=bstate.blacklist_flags,
            blacklist_ids=bstate.blacklist_ids,
            second_image=second_image,
            stereo_guess=stereo_guess,
            pose_rot=pose_rot,
            camera0=camera0,
        )
        if dense_depth:
            depths = track_dense_depth(
                image, second_image, tout.pixels[:, 0, :], tout.track_ids >= 0)
        else:
            depths = jnp.full((T,), -1.0, dtype)
        tin = TrackerInput(
            track_ids=tout.track_ids,
            pixels=tout.pixels.astype(dtype),
            keyframe=tout.keyframe,
            stereo_depth=depths,
            track_status=tout.status,
            prev_pixels=tout.prev_pixels,
            viz_pixels=tout.viz_pixels,
        )
        return VioState(backend=bstate, tracker=tstate,
                        tracker_ready=state.tracker_ready), tin

    def backend_stage(state: VioState, tin: TrackerInput, camera0=None):
        """Estimator stage: visual updates + augmentation (frame_step)."""
        bstate, out = frame_step.process_frame(state.backend, tin,
                                               camera0=camera0)
        return state._replace(backend=bstate), out

    def vio_step(state: VioState, imu: ImuBatch, image, second_image=None,
                 camera0=None):
        # IMU propagation first so the flow prediction uses the pose at the
        # frame time (reference: tracker runs after ekf->predict,
        # backend.cpp:735-765)
        state = imu_only(state, imu)
        state, tin = track_stage(state, imu.t[-1], image, second_image,
                                 camera0)
        return backend_stage(state, tin, camera0)

    # staged entry points: chunked IMU processing (api/vio.py) and the
    # per-stage '-timer' path (reference per-label report, main.cpp:1008-1016)
    vio_step.imu_only = imu_only
    vio_step.track_stage = track_stage
    vio_step.backend_stage = backend_stage
    return init_fn, vio_step
