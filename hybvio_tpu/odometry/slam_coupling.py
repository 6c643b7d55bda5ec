"""Odometry <-> SLAM coupling: async submission + coordinate transform.

Port of the backend's SLAM glue (reference: backend.cpp:32-96 Slam-
OdometryCoordinateTransformer, 399-539 applySlam/applySlamResult): every
keyframeCandidateInterval-th slam frame is pushed to the SLAM backend (async
on its own thread when slam.slamThread); the result is consumed
delayIntervalMultiplier intervals later; a rigid odometry->SLAM transform is
re-anchored from each (odometry pose, SLAM pose) pair and applied to all
outputs thereafter.
"""
from __future__ import annotations

import concurrent.futures
import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..slam.host import host_jit, np_quat_to_rmat, np_rmat_to_quat
from ..slam.session import Slam, SlamResult, mat_to_pose, pose_to_mat


def _np_remove_z_tilt(R):
    rotated_x = R[:, 0]
    a = np.arctan2(rotated_x[1], rotated_x[0])
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


class SlamOdometryCoordinateTransformer:
    """Maintains world_odo -> world_slam rigid transform
    (reference: backend.cpp:32-96)."""

    def __init__(self, remove_z_tilt: bool = True):
        self.T = np.eye(4)
        self.ready = False
        self.remove_z_tilt = remove_z_tilt

    def set_coordinates(self, odo_cw: np.ndarray, slam_cw: np.ndarray) -> None:
        """Re-anchor so that T @ odo_cw == slam_cw (reference: setCoordinates)."""
        T = slam_cw @ np.linalg.inv(odo_cw)
        if self.remove_z_tilt:
            Rxy = _np_remove_z_tilt(T[:3, :3])
            # keep the anchor point fixed: T' p_anchor = T p_anchor
            p = odo_cw[:3, 3]
            t_new = (T[:3, :3] @ p + T[:3, 3]) - Rxy @ p
            T = np.eye(4)
            T[:3, :3] = Rxy
            T[:3, 3] = t_new
        self.T = T
        self.ready = True

    def transform_pose_cw(self, odo_cw: np.ndarray) -> np.ndarray:
        return self.T @ odo_cw if self.ready else odo_cw

    def transform_point(self, p: np.ndarray) -> np.ndarray:
        if not self.ready:
            return p
        return self.T[:3, :3] @ p + self.T[:3, 3]

    def transform_position_orientation(self, pos, quat):
        if not self.ready:
            return pos, quat
        R = self.T[:3, :3]
        p = R @ np.asarray(pos) + self.T[:3, 3]
        Rq = np_quat_to_rmat(np.asarray(quat))  # world->imu
        q = np_rmat_to_quat(Rq @ R.T)
        return p, q


@dataclasses.dataclass
class _Pending:
    future: "concurrent.futures.Future"
    odo_cw: np.ndarray


class SlamCoupling:
    """Drives the Slam session at the reference cadence with async results."""

    def __init__(self, params, imu_to_camera: np.ndarray, use_thread: Optional[bool] = None,
                 camera=None):
        ps = params.slam
        self.ps = ps
        self.slam = Slam(params)
        self.i2c = np.asarray(imu_to_camera)
        # the real camera model: used to place ORB descriptor patches at the
        # TRUE pixel positions of the tracker features (a nominal-focal
        # reconstruction is wrong across most of a fisheye FOV). Converted to
        # host-resident leaves once: the projection runs on the CPU backend
        # at keyframe rate (slam/host.py), and device-committed camera fields
        # would pull it back onto the accelerator.
        if camera is not None:
            import jax

            camera = jax.tree_util.tree_map(np.asarray, camera)
        self.camera = camera
        self._ray_to_pixel = None
        self.interval = max(int(ps.keyframeCandidateInterval), 1)
        self.delay_mult = ps.delayIntervalMultiplier
        self.coord = SlamOdometryCoordinateTransformer(ps.removeOdometryTransformZAxisTilt)
        self.frame_counter = 0
        self.pending: List[_Pending] = []
        use_thread = ps.slamThread if use_thread is None else use_thread
        self.pool = (concurrent.futures.ThreadPoolExecutor(max_workers=1)
                     if use_thread else None)
        self.point_cloud: List[Tuple[int, int, np.ndarray]] = []
        # backlog policy: with the async worker, ingestion NEVER blocks on
        # SLAM (reference contract: real-time odometry with an async SLAM
        # thread, backend.cpp:507-518). If the worker falls behind by more
        # than max_backlog submissions past the delay contract, new keyframe
        # candidates are DROPPED — the analog of sample sync's smart frame
        # limiter (reference: sample_sync.cpp:140-162) — and counted.
        self.max_backlog = 2
        self.dropped = 0
        self._quantize_u8 = None  # lazily jitted on-device u8 quantizer

    def _project_pixels(self, norm_pts: np.ndarray) -> np.ndarray:
        """Normalized points -> pixels through the REAL camera model
        (reference: the SLAM module samples ORB on the distorted image at the
        feature's actual pixel; with a KB4 fisheye the nominal-focal fallback
        is off by tens of pixels at mid-FOV). Host CPU program: pad to a
        static count so the jit reuses one compilation."""
        from ..geometry.cameras import ray_to_pixel

        if self._ray_to_pixel is None:
            self._ray_to_pixel = host_jit(ray_to_pixel)
        n = len(norm_pts)
        PAD = 256
        P = PAD
        while P < n:
            P *= 2
        rays = np.ones((P, 3), np.float32)
        rays[:n, :2] = norm_pts
        pix, _ok = self._ray_to_pixel(self.camera, rays)
        return np.asarray(pix)[:n]

    def imu_pose_to_camera_cw(self, pos, quat) -> np.ndarray:
        """IMU pose (world->imu q) -> camera-to-world 4x4."""
        R = np_quat_to_rmat(np.asarray(quat))  # world -> imu
        w2c = self.i2c[:3, :3] @ R
        t = -w2c @ np.asarray(pos) + self.i2c[:3, 3]
        T = np.eye(4)
        T[:3, :3] = w2c.T
        T[:3, 3] = -w2c.T @ t
        return T

    def maybe_submit(self, image, pos, quat, track_ids, norm_pts, t, frame_num) -> bool:
        """Call on every KEYFRAME (reference: applySlam); submits every
        interval-th. Returns True if a slam frame was submitted."""
        self.frame_counter += 1
        if (self.frame_counter - 1) % self.interval != 0:
            return False
        odo_cw = self.imu_pose_to_camera_cw(pos, quat)

        # device-resident float frames are quantized to uint8 ON DEVICE
        # before the worker's D2H fetch: 4x fewer bytes over the link (a
        # full-res f32 fetch cost ~0.15 s/candidate through the TPU tunnel —
        # a major share of the worker budget and hence of candidate drops).
        # The SLAM pipeline normalizes 8-bit frames; the reference's SLAM
        # likewise consumes 8-bit gray (image.cpp:345-367). Dispatch here
        # (async, main thread); the fetch happens later on the worker.
        if image is not None and not isinstance(image, np.ndarray):
            import jax.numpy as jnp

            if hasattr(image, "dtype") and jnp.issubdtype(image.dtype,
                                                          jnp.floating):
                if self._quantize_u8 is None:
                    import jax

                    self._quantize_u8 = jax.jit(
                        lambda x: (jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5)
                        .astype(jnp.uint8))
                image = self._quantize_u8(image)

        # consume delayed results first (reference: backend.cpp:405-434)
        max_pending = max(self.delay_mult, 0)
        if self.delay_mult < 0:
            # synchronous contract (delayIntervalMultiplier < 0,
            # backend.cpp:416,514-517): block for every result
            while self.pending:
                self._consume(self.pending.pop(0))
        else:
            # async contract: consume results past their delay that are
            # READY; never stall frame ingestion on the SLAM worker
            while len(self.pending) > max_pending and (
                    self.pool is None or self.pending[0].future.done()):
                self._consume(self.pending.pop(0))
            if len(self.pending) > max_pending + self.max_backlog:
                self.dropped += 1
                return False

        def work(img=image, ocw=odo_cw, ids=np.array(track_ids), pts=np.array(norm_pts),
                 tt=float(t), fn=int(frame_num)):
            sel = ids >= 0
            # convert here — after the interval gate — so skipped keyframes
            # never pay a device-to-host copy for the gray frame. Integer
            # frames are raw 0-255 (uint8 ingestion path) and the SLAM
            # detectors/descriptors expect [0,1].
            if img is not None:
                raw = np.asarray(img)
                img = (raw.astype(np.float32) / 255.0
                       if raw.dtype.kind in "ui" else
                       np.asarray(raw, np.float32))
            pix = self._project_pixels(pts[sel]) if self.camera is not None else None
            return self.slam.add_frame(img, ocw, ids[sel], pts[sel], tt, fn,
                                       pix_pts=pix), ocw

        if self.pool is not None:
            fut = self.pool.submit(work)
        else:
            fut = concurrent.futures.Future()
            fut.set_result(work())
        self.pending.append(_Pending(fut, odo_cw))
        return True

    def _consume(self, pending: _Pending) -> None:
        result, odo_cw = pending.future.result()
        self.coord.set_coordinates(odo_cw, result.pose_cw)
        self.point_cloud = result.point_cloud

    def finish(self, map_save_path=None) -> None:
        while self.pending:
            self._consume(self.pending.pop(0))
        self.slam.end(map_save_path=map_save_path)
        if self.pool is not None:
            self.pool.shutdown(wait=True)
