"""Public VIO API: thread-safe sample ingestion -> outputs via callback.

Port of the reference public API + control layer (reference: src/api/vio.hpp
VioApi, src/odometry/control.cpp Control): add_gyro / add_acc /
add_frame_mono / add_frame_stereo feed a SampleSync; synced samples drain into
the device-side VIO step; tracking-status-driven auto-reset (retry-until-init,
reset-keeping-pose on LOST_TRACKING, timed re-init) wraps the session like the
reference Control; outputs are delivered through on_output.

Host/device split: SampleSync and the reset state machine stay on the host
(IO-shape logic); everything per-frame runs as the single jitted vio_step.
IMU samples between frames batch into fixed-size arrays (the ~400 Hz IMU-only
path costs one padded scan per frame instead of per-sample dispatches).
"""
from __future__ import annotations

import dataclasses
import os
import threading
from typing import Callable, List, Optional

import numpy as np

from ..config import DerivedParameters, Parameters
from ..config.loader import load_parameters
from ..geometry.cameras import build_camera_from_params
from ..odometry.sample_sync import SampleSync, SyncedSample
from ..io.jsonl import Recorder, output_to_json

TRACKING_STATUS_NAMES = {0: "INIT", 1: "TRACKING", 2: "LOST_TRACKING"}


@dataclasses.dataclass
class VioOutput:
    status: int
    t: float
    position: np.ndarray
    orientation: np.ndarray
    velocity: np.ndarray
    position_covariance: np.ndarray
    point_cloud: np.ndarray  # (N, 4): id, x, y, z
    pose_trail: Optional[np.ndarray] = None  # (L, 8): t, p(3), q(4)
    bias_gyro: Optional[np.ndarray] = None
    bias_acc: Optional[np.ndarray] = None
    stationary_visual: bool = False
    velocity_covariance: Optional[np.ndarray] = None
    bias_covariance_diagonal: Optional[np.ndarray] = None  # (9,) BGA+BAA+BAT

    def as_json(self, with_trail: bool = False, extras: Optional[dict] = None) -> str:
        trail = None
        if with_trail and self.pose_trail is not None:
            trail = self.pose_trail[:, 1:]
        return output_to_json(self.t, self.position, self.orientation,
                              self.velocity, trail, extras)


class VioApi:
    """Build with build_vio(); feed samples; read outputs via on_output."""

    def __init__(self, params: Parameters, width: int, height: int,
                 dtype=None, max_imu_per_frame: int = 64, jit: bool = True,
                 recording_only: bool = False,
                 native_sync: Optional[bool] = None):
        import jax
        import jax.numpy as jnp

        from ..odometry.vio import make_vio

        # record inputs without running the algorithm (reference:
        # DebugParameters::recordingOnly, internal.hpp:113-115 — the control
        # pipeline is never built and every add* returns after recording,
        # api.cpp:80,119,420,542,585)
        self.recording_only = bool(recording_only)
        self.params = params
        self.derived = DerivedParameters.from_parameters(params)
        self.width, self.height = width, height
        # the reference filter runs f64 (ekf.cpp); honor that only when JAX
        # x64 is actually enabled — otherwise jnp.float64 silently truncates
        # to f32 at every zeros/asarray with a UserWarning per call site
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self._dtype = dtype
        # static: EKFState.P holds a square-root factor instead of the dense
        # covariance (ekf/sqrt.py; odometry.useSquareRootEkf TPU extension)
        self._sqrt_mode = bool(getattr(params.odometry, "useSquareRootEkf", False))
        cams = [build_camera_from_params(params.tracker, width, height, dtype=self._dtype)]
        if params.tracker.useStereo:
            cams.append(build_camera_from_params(params.tracker, width, height, second=True, dtype=self._dtype))
        self.cameras = tuple(cams)

        if self.recording_only:
            # no control pipeline at all (reference: api.cpp:80 passes a
            # null Control); add* methods record and return
            self._init_fn = self._vio_step = self._imu_only = None
            self._track_stage = self._backend_stage = None
        else:
            self._init_fn, vio_step = make_vio(
                params, self.derived, self.cameras, dtype=self._dtype)
            self._vio_step = jax.jit(vio_step) if jit else vio_step
            self._imu_only = jax.jit(vio_step.imu_only) if jit else vio_step.imu_only
            # staged programs for the '-timer' per-label report (reference:
            # per-stage scope timers, ekf.cpp:355 / tracker.cpp:56,249 /
            # ransac_pipeline.cpp:206-283, reported by main.cpp:1008-1016)
            self._track_stage = jax.jit(vio_step.track_stage) if jit else vio_step.track_stage
            self._backend_stage = jax.jit(vio_step.backend_stage) if jit else vio_step.backend_stage
        self._jnp = jnp

        # sample synchronizer: the native (C++) implementation is the default
        # hot path (reference: sample_sync.cpp is C++ in-process too);
        # native_sync=None auto-selects it when the library is built and the
        # config has no per-camera shift averaging (which the Python
        # implementation handles in add_frame). HYBVIO_NATIVE_SYNC=0 forces
        # the pure-Python synchronizer.
        self.sample_sync = None
        if native_sync is None:
            native_sync = (os.environ.get("HYBVIO_NATIVE_SYNC", "1") != "0"
                           and params.odometry.secondImuToCameraShiftSeconds == 0.0)
        if native_sync:
            try:
                from ..io.native_sync import NativeSampleSync

                self.sample_sync = NativeSampleSync(params.odometry)
            except Exception:
                self.sample_sync = None  # fall back below
        if self.sample_sync is None:
            self.sample_sync = SampleSync(params.odometry)
        self.on_output: Optional[Callable[[VioOutput], None]] = None
        self.recorder: Optional[Recorder] = None
        self.debug_api = None  # optional odometry.debug.DebugAPI
        self._lock = threading.Lock()

        # -timer profiling (reference: util/timer.hpp TIME_STATS; enabled by
        # the CLI -timer flag)
        from ..utils.timer import TimeStats

        self.time_stats = TimeStats(enabled=False)
        # per-track visual-update outcome counters (reference:
        # odometry.printVisualUpdateStats -> VisualUpdateStats,
        # visual_update_stats.hpp:9-40, printed per frame + totals)
        from ..odometry.stats import VisualUpdateStats

        self.vu_stats = VisualUpdateStats(
            enabled=bool(params.odometry.printVisualUpdateStats))
        # pose histories for overlays: method name -> [(t, x, y, z), ...]
        # (reference: api.cpp:287-305,447-489 ARKit/ARCore/GPS ingestion)
        self.pose_histories: dict = {}
        self._gps_converter = None
        self._frozen: Optional[tuple] = None  # freezeOnFailedTracking

        self._state = None
        self._pending_imu: List = []
        self.S = max_imu_per_frame
        # pooled gray-frame buffers for _to_gray (reference: util::Allocator)
        from ..utils.allocator import Allocator

        self._gray_pool = Allocator(
            lambda: np.empty((height, width), np.float32), max_size=64)
        # 8-bit frames ride a separate pool and stay uint8 until the device
        # (4x smaller H2D; the jitted step normalizes on device)
        self._u8_pool = Allocator(
            lambda: np.empty((height, width), np.uint8), max_size=64)
        self._first_image = None
        self._status = 0
        self._last_reset_time = 0.0
        self.last_frame_output = None
        # video visualization selection (reference: InternalAPI::
        # setVisualization, internal.hpp:287 + VisualizationMode:66-81)
        self._visualization = 0  # VisualizationMode.NONE
        self._last_images: tuple = (None, None)
        self._stage_probes = None  # built on first -timer frame
        self._threshold_warned = 0.01
        self._frame_count = 0
        # pipelined output retirement: dispatch frame N's jitted step before
        # fetching frame N-1's output, so device compute overlaps the D2H
        # round trip (the analog of the reference's input-thread /
        # odometry-thread pipeline, api.cpp:1019; over a high-latency TPU
        # tunnel a synchronous per-frame device_get serializes step latency
        # and RTT). Depth 0 = fully synchronous (forced for -timer and
        # debug-publisher sessions). Host-side consumers (status machine,
        # SLAM submit, on_output) see each output exactly once, one frame
        # late; finish()/wait_idle() flush the tail.
        import collections

        self._inflight = collections.deque()
        env_depth = os.environ.get("HYBVIO_PIPELINE_DEPTH")
        self._pipeline_depth = (int(env_depth) if env_depth is not None
                                else (1 if (jit and not recording_only) else 0))

        # latency-smoothing output buffer (reference: api::OutputBuffer,
        # output_buffer.hpp; active when targetOutputDelaySeconds > 0)
        self.output_buffer = None
        if params.odometry.targetOutputDelaySeconds > 0:
            from .output_buffer import OutputBuffer

            self.output_buffer = OutputBuffer(
                params.odometry.targetOutputDelaySeconds)

        # optional odometry worker thread (reference: processingQueueSize)
        self._queue = None
        self._worker = None
        if params.odometry.processingQueueSize > 0:
            self._start_worker(params.odometry.processingQueueSize)

        # optional async SLAM backend (reference: slam.useSlam + applySlam)
        self.slam = None
        if params.slam.useSlam and not self.recording_only:
            from ..odometry.slam_coupling import SlamCoupling

            self.slam = SlamCoupling(params, self.derived.imu_to_camera,
                                     camera=self.cameras[0])

    # --- input (reference: VioApi::addGyro/addAcc/addFrame*) ---

    def add_gyro(self, t: float, xyz) -> None:
        with self._lock:
            if self.recorder:
                self.recorder.gyro(t, xyz)
            if self.recording_only:
                return  # (reference: api.cpp:119)
            self.sample_sync.add_sample_leader(t, xyz)
        self.process_pending()

    def add_acc(self, t: float, xyz) -> None:
        with self._lock:
            if self.recorder:
                self.recorder.acc(t, xyz)
            if self.recording_only:
                return
            self.sample_sync.add_sample_follower(t, xyz)

    def _to_gray(self, image):
        # device-resident frames pass straight through — the analog of the
        # reference's GPU-texture ingestion (addFrameMonoOpenGl,
        # internal.hpp:216-244): the caller already owns an accelerator
        # buffer and a D2H+H2D round trip (~0.3 s over a TPU tunnel) must
        # not be forced on the hot path
        import jax

        if isinstance(image, jax.Array) and image.ndim == 2:
            import jax.numpy as jnp

            if image.dtype == jnp.float32 or jnp.issubdtype(image.dtype,
                                                            jnp.integer):
                # integer frames stay raw: the jitted step normalizes on
                # device (odometry/vio.py normalize_input), so no extra
                # device op is dispatched here
                return image
            return image.astype(jnp.float32)
        a = np.asarray(image)
        if a.ndim == 3 and a.shape[-1] in (3, 4):
            # color input -> reference luma conversion (image.cpp:345-367)
            from ..frontend.image_utils import rgb_to_gray

            a = rgb_to_gray(a[..., :3])
        if a.dtype == np.uint8:
            # 8-bit frames stay uint8 end-to-end until the device: the
            # host->device transfer ships 1/4 the bytes of a pre-normalized
            # float32 frame (the reference likewise ingests 8-bit frames,
            # image.cpp:345-367) and the jitted step normalizes on device.
            # Copy into a pooled buffer so the caller may reuse its frame
            # buffer immediately (upload happens later, at step dispatch).
            if a.shape == (self.height, self.width):
                buf = self._u8_pool.next()
                np.copyto(buf, a)
                return buf
            return a.copy()
        if a.dtype != np.float32:
            # convert INTO a pooled host buffer (reference: the image factory
            # allocates frames from util::Allocator pools, image.cpp /
            # allocator.hpp:19-68) — avoids a fresh (H,W) allocation per frame
            # on the ingestion hot path; a slot is free once sample sync and
            # the frame step dropped their references
            if a.shape == (self.height, self.width):
                buf = self._gray_pool.next()
                np.copyto(buf, a, casting="unsafe")
                return buf
            return a.astype(np.float32)
        return a

    def add_frame_mono(self, t: float, image) -> None:
        with self._lock:
            if self.recorder:
                self.recorder.frame(t, [image])
            if self.recording_only:
                return  # (reference: api.cpp:542,585)
            self.sample_sync.add_frame(t, first_image=self._to_gray(image))

    def add_frame_mono_varying(self, t: float, image, intrinsics) -> None:
        """Mono frame with per-frame intrinsics (reference:
        InternalAPI::addFrameMonoVarying, internal.hpp:216-230 — mobile
        autofocus changes the focal length mid-session).

        intrinsics: dict with focalLengthX/focalLengthY/principalPointX/
        principalPointY (reference JSONL cameraParameters spelling,
        input_jsonl.cpp:119-199) or a (fx, fy[, cx, cy[, coeffs]]) sequence.
        The values ride the jitted step as DYNAMIC arrays (same compiled
        program for every lens state)."""
        if self.params.tracker.useStereo:
            raise ValueError("varying intrinsics supported for mono only")
        intr = self._normalize_intrinsics(intrinsics)
        with self._lock:
            if self.recorder:
                self.recorder.frame(t, [image], camera_params=[{
                    "focalLengthX": intr[0], "focalLengthY": intr[1],
                    "principalPointX": intr[2], "principalPointY": intr[3]}])
            if self.recording_only:
                return
            self.sample_sync.add_frame(t, first_image=self._to_gray(image),
                                       intrinsics=intr)

    def _normalize_intrinsics(self, intrinsics):
        """-> (fx, fy, cx, cy, coeffs_or_None) floats."""
        if isinstance(intrinsics, dict):
            fx = intrinsics.get("focalLengthX", intrinsics.get("fx", -1.0))
            fy = intrinsics.get("focalLengthY", intrinsics.get("fy", fx))
            cx = intrinsics.get("principalPointX", intrinsics.get("cx", -1.0))
            cy = intrinsics.get("principalPointY", intrinsics.get("cy", -1.0))
            coeffs = intrinsics.get("distortionCoefficients",
                                    intrinsics.get("coeffs"))
        else:
            seq = list(intrinsics)
            fx = seq[0]
            fy = seq[1] if len(seq) > 1 else fx
            cx = seq[2] if len(seq) > 2 else -1.0
            cy = seq[3] if len(seq) > 3 else -1.0
            coeffs = seq[4] if len(seq) > 4 else None
        if fx <= 0:
            raise ValueError("varying intrinsics need a positive focal length")
        if fy <= 0:
            fy = fx
        base = self.cameras[0]
        if cx <= 0:
            cx = float(np.asarray(base.cx))
        if cy <= 0:
            cy = float(np.asarray(base.cy))
        return (float(fx), float(fy), float(cx), float(cy),
                tuple(coeffs) if coeffs is not None else None)

    def _varying_camera(self, intr):
        """Dynamic per-frame Camera pytree from normalized intrinsics."""
        from ..geometry.cameras import with_intrinsics

        return with_intrinsics(self.cameras[0], intr[0], intr[1], intr[2],
                               intr[3], coeffs=intr[4])

    def add_frame_stereo(self, t: float, first, second) -> None:
        with self._lock:
            if self.recorder:
                self.recorder.frame(t, [first, second])
            if self.recording_only:
                return
            self.sample_sync.add_frame(t, first_image=self._to_gray(first),
                                       second_image=self._to_gray(second))

    def add_echo(self, raw: dict) -> None:
        """Ingest an auxiliary pose line from the input (groundTruth / ARKit /
        arcore / realsense / gps / rtkgps; reference: api.cpp:287-305,447-489).
        Used for pose-plot overlays; GPS is converted WGS84 -> local ENU."""
        t = raw.get("time", 0.0)
        for name in ("groundTruth", "ARKit", "arcore", "arengine", "realsense",
                     "output", "zed"):
            d = raw.get(name)
            if isinstance(d, dict) and "position" in d:
                p = d["position"]
                self.pose_histories.setdefault(name, []).append(
                    (t, p.get("x", 0.0), p.get("y", 0.0), p.get("z", 0.0)))
                return
        for name in ("gps", "rtkgps"):
            d = raw.get(name)
            if isinstance(d, dict) and "latitude" in d:
                if self._gps_converter is None:
                    from ..utils.gps import GpsToLocalConverter

                    self._gps_converter = GpsToLocalConverter()
                xyz = self._gps_converter.convert(
                    d["latitude"], d["longitude"], d.get("altitude", 0.0))
                self.pose_histories.setdefault(name, []).append(
                    (t, xyz[0], xyz[1], xyz[2]))
                return

    def finish(self, slam_map_poses_path=None) -> None:
        """Flush async SLAM and run the final global adjustment (reference:
        slam::Slam::end() via main.cpp teardown; -slamMapPosesPath saves the
        keyframe map)."""
        if self._queue is not None:
            self._queue.join()
            self._queue.put(None)
            self._worker.join(timeout=30)
            self._queue = None
        self._flush_pipeline()
        if self.output_buffer is not None and self.on_output:
            # drain outputs still held for their scheduled emit time
            while self.output_buffer.buf:
                self.on_output(self.output_buffer.buf.popleft())
        if self.slam is not None:
            self.slam.finish(map_save_path=slam_map_poses_path)
        if self.recorder is not None:
            self.recorder.close()

    def set_parameter_string(self, s: str) -> None:
        """Runtime parameter assignment "key value;key value" (reference:
        api.cpp:491-496 setParameterString). Static parameters baked into the
        compiled programs take effect at the next reset()."""
        from ..config.loader import set_key_value

        for part in s.replace(";", "\n").splitlines():
            part = part.strip()
            if not part:
                continue
            k, _, v = part.partition(" ")
            set_key_value(self.params, k.strip(), v.strip() or "true")

    # --- processing (reference: Control::processSyncedSamples) ---

    def process_pending(self) -> int:
        """Drain synced samples; returns number of frames processed/queued."""
        frames = 0
        while True:
            s = self.sample_sync.poll_synced_sample()
            if s is None:
                break
            self._pending_imu.append(s)
            if s.frame is not None:
                if self._queue is not None:
                    # odometry worker thread (reference:
                    # odometry.processingQueueSize > 0 -> controlProcessingQueue,
                    # api.cpp:1019, util/bounded_processing_queue.hpp):
                    # bounded; enqueue blocks when full like the reference
                    imu = self._pending_imu
                    self._pending_imu = []
                    self._queue.put((imu, s))
                else:
                    self._process_frame(s)
                frames += 1
        return frames

    def _start_worker(self, max_size: int) -> None:
        import queue

        self._queue = queue.Queue(maxsize=max_size)

        def work():
            while True:
                item = self._queue.get()
                if item is None:
                    return
                imu, s = item
                try:
                    self._pending_imu = imu + self._pending_imu
                    self._process_frame(s)
                except Exception as e:  # pragma: no cover - surfacing only
                    import traceback

                    traceback.print_exc()
                finally:
                    self._queue.task_done()

        self._worker = threading.Thread(target=work, daemon=True)
        self._worker.start()

    def wait_idle(self) -> None:
        """Block until the odometry worker has drained its queue and every
        in-flight pipelined output has been retired (synchronization point
        for callers that need the latest output delivered)."""
        if self._queue is not None:
            self._queue.join()
        self._flush_pipeline()

    def _as_input(self, image):
        """Frame -> device input for the jitted step, preserving integer
        dtypes (uint8 ships 1/4 the H2D bytes; the step normalizes on
        device, odometry/vio.py normalize_input)."""
        jnp = self._jnp
        a = jnp.asarray(image)
        if jnp.issubdtype(a.dtype, jnp.integer) or a.dtype == jnp.float32:
            return a
        return a.astype(jnp.float32)

    @staticmethod
    def _norm_gray(image):
        """Frame (host or device, float or integer) -> float32 in [0,1] for
        host-side consumers (viz overlays, stage probes, SLAM descriptors).
        Integer dtypes are raw 0-255."""
        if image is None:
            return None
        import jax

        if isinstance(image, jax.Array):
            import jax.numpy as jnp

            if jnp.issubdtype(image.dtype, jnp.integer):
                return image.astype(jnp.float32) / 255.0
            return image if image.dtype == jnp.float32 else image.astype(jnp.float32)
        a = np.asarray(image)
        if a.dtype.kind in "ui":
            return a.astype(np.float32) / 255.0
        return a if a.dtype == np.float32 else a.astype(np.float32)

    def _ensure_state(self, image, t, second_image=None):
        if self._state is None:
            second = (self._as_input(second_image)
                      if second_image is not None else None)
            self._state = self._init_fn(
                self._as_input(image), t0=float(t), second_image=second)

    def _process_frame(self, synced: SyncedSample) -> None:
        import jax.numpy as jnp

        from ..odometry.backend import ImuBatch

        samples = self._pending_imu
        self._pending_imu = []
        frame = synced.frame
        image = frame.first_image
        second = frame.second_image
        # per-frame varying intrinsics ride the jitted step as a dynamic
        # Camera pytree (same compiled program across lens states)
        cam0_dyn = (self._varying_camera(frame.intrinsics)
                    if getattr(frame, "intrinsics", None) is not None else None)

        if self._state is None:
            self._ensure_state(image, synced.t, second)
            return

        def imu_batch(chunk):
            # fixed (S,)-shaped batch; tail padding is valid=False and skipped
            # inside the scan, so only two compiled shapes ever exist
            t = np.full(self.S, chunk[-1].t if chunk else synced.t)
            g = np.zeros((self.S, 3))
            a = np.zeros((self.S, 3))
            valid = np.zeros(self.S, bool)
            for i, s in enumerate(chunk):
                t[i] = s.t
                g[i] = s.l
                a[i] = s.f
                valid[i] = True
            dtype = self._dtype
            return ImuBatch(jnp.asarray(t, dtype), jnp.asarray(g, dtype),
                            jnp.asarray(a, dtype), jnp.asarray(valid))

        # Process ALL pending samples: every chunk of S beyond the last rides
        # an IMU-only propagation step, the final <=S samples ride the frame
        # step. The reference integrates every synced sample
        # (control.cpp:79-155); truncating to the last S would silently drop
        # motion at high IMU rates (e.g. 800 Hz IMU at 10 FPS frames).
        if len(samples) > self.S:
            lead, samples = samples[:-self.S], samples[-self.S:]
            for i in range(0, len(lead), self.S):
                self._state = self._imu_only(self._state, imu_batch(lead[i:i + self.S]))
        batch = imu_batch(samples)
        self.time_stats.start_frame()
        if self.time_stats.enabled:
            # staged execution with per-label scopes (the fused step cannot be
            # attributed from the host); blocking probes pin device work to
            # the right label. Deeper attribution (LK vs detect vs RANSAC) is
            # in tools/profile_step.py.
            import jax

            with self.time_stats.scope("KF predict (IMU scan)"):
                self._state = self._imu_only(self._state, batch)
                jax.block_until_ready(self._state.backend.ekf.m)
            # staged path + probes expect normalized frames (they call the
            # sub-programs directly, below the step's on-device normalizer)
            imgs = (self._norm_gray(image),)
            if self.params.tracker.useStereo:
                imgs = imgs + (self._norm_gray(second),)
            with self.time_stats.scope("tracker (flow+LK+detect+RANSAC)"):
                self._state, tin = self._track_stage(
                    self._state, jnp.asarray(batch.t[-1], self._dtype), *imgs,
                    camera0=cam0_dyn)
                jax.block_until_ready(tin.pixels)
            with self.time_stats.scope("visual update + augmentation"):
                self._state, out = self._backend_stage(self._state, tin,
                                                       camera0=cam0_dyn)
                jax.block_until_ready(out.position)
            # per-frame sub-stage attribution: run the front-end sub-programs
            # on THIS frame's images and track positions and accumulate one
            # sample per label (the reference accumulates per-label stats
            # across every frame, util/timer.hpp:15-55 + main.cpp:1008-1016;
            # a last-frame-only re-timing hides the distribution)
            if self._stage_probes is None:
                from ..utils.stage_attribution import StageProbes

                H, W = np.asarray(image).shape[:2]
                self._stage_probes = StageProbes(
                    self.params, self.cameras, H, W,
                    self.params.tracker.useStereo)
            for label, sec in self._stage_probes.run_frame(
                    imgs[0], imgs[1] if len(imgs) > 1 else None,
                    tin.pixels[:, 0, :].astype(jnp.float32),
                    tin.track_ids >= 0).items():
                self.time_stats.add_sample(label, sec)
        elif self.params.tracker.useStereo:
            self._state, out = self._vio_step(
                self._state, batch, self._as_input(image),
                self._as_input(second))
        elif cam0_dyn is not None:
            self._state, out = self._vio_step(
                self._state, batch, self._as_input(image),
                None, cam0_dyn)
        else:
            self._state, out = self._vio_step(
                self._state, batch, self._as_input(image))

        # One batched D2H for the whole per-frame output: downstream host
        # logic (status machine, SLAM submit, output conversion, viz taps)
        # reads a dozen separate fields; fetching them one np.asarray at a
        # time costs a full device round trip EACH. With pipeline depth > 0
        # the fetch itself is deferred one frame: copies start async NOW and
        # the retire happens after the NEXT frame's step is dispatched, so
        # device compute and D2H overlap instead of serializing.
        import jax as _jax

        aux = (image, second)
        depth = (0 if (self.time_stats.enabled or self.debug_api is not None)
                 else self._pipeline_depth)
        if depth <= 0:
            self._retire(_jax.device_get(out), aux)
        else:
            for leaf in _jax.tree_util.tree_leaves(out):
                if hasattr(leaf, "copy_to_host_async"):
                    leaf.copy_to_host_async()
            self._inflight.append((out, aux))
            while len(self._inflight) > depth:
                o, a = self._inflight.popleft()
                self._retire(_jax.device_get(o), a)

    def _flush_pipeline(self) -> None:
        """Retire every in-flight output (end of stream / sync points)."""
        import jax as _jax

        while self._inflight:
            o, a = self._inflight.popleft()
            self._retire(_jax.device_get(o), a)

    def _retire(self, out, aux) -> None:
        """Host-side consumption of one fetched FrameOutput: time-shift
        feedback, stats, SLAM submit, status machine/auto-reset, debug
        publishing, output conversion + delivery."""
        image, second = aux

        # time-shift feedback into sample sync (reference: control.cpp:97-106;
        # the estimate rides the output, no extra state fetch). Clamped: a
        # shift larger than the sync pairing horizon would silently unpair
        # every future frame, which is strictly worse than ignoring the
        # estimate (SFT is a sub-frame-interval quantity by construction).
        if self.params.odometry.estimateImuCameraTimeShift:
            sft = float(out.sft)
            if np.isfinite(sft):
                self.sample_sync.set_imu_to_camera_time_shift(
                    float(np.clip(sft, -0.2, 0.2)))

        self._frame_count += 1
        # raw per-frame output for visualization taps (reference: TaggedFrame
        # payload threaded to the views, odometry/tagged_frame.hpp:33-71)
        self.last_frame_output = out
        self._last_images = (image, second)
        if self.vu_stats.enabled:
            self.vu_stats.count_from_output(out.point_cloud_status)
            line = self.vu_stats.finish_frame()
            if line:
                from ..utils.logging import log_info

                log_info("visual updates: %s", line)
        if self.slam is not None and bool(out.keyframe):
            with self.time_stats.scope("slam submit"):
                # image stays as-is (possibly device-resident); the coupling
                # converts AFTER its every-Nth-interval check so skipped
                # keyframes never pay a device-to-host copy
                self.slam.maybe_submit(
                    image,
                    np.asarray(out.position), np.asarray(out.orientation),
                    np.asarray(out.track_ids), np.asarray(out.track_norm),
                    float(out.t), self._frame_count)

        self._handle_status_and_reset(out)
        if self.debug_api is not None and self.debug_api.publisher is not None:
            # publish sites mirror the reference's DebugPublisher hooks
            # embedded in trackerVisualUpdate (reference: debug.hpp:25-47;
            # publish sites backend.cpp:1061-1064,1197-1201,
            # triangulation.cpp:148-150,181-183)
            from ..odometry.backend import PF_HYBRID, PF_POSE_TRAIL
            from ..odometry.triangulation import TRI_OK

            pub = self.debug_api.publisher
            pub.start_frame(float(out.t), self._state)
            t = float(out.t)
            pc = np.asarray(out.point_cloud)
            ids = np.asarray(out.point_cloud_ids)
            pf_status = np.asarray(out.point_cloud_status)
            tri_status = np.asarray(out.vu_tri_status)
            for i in np.where(ids >= 0)[0]:
                pub.start_visual_update(t, int(ids[i]), None)
                if tri_status[i] == TRI_OK:
                    pub.push_triangulation_point(pc[i])
                if pf_status[i] in (PF_POSE_TRAIL, PF_HYBRID):
                    pub.finish_successful_visual_update(t, int(ids[i]))
            if (ids >= 0).any():
                pub.add_point_cloud(pc[ids >= 0])
        if self.on_output:
            with self.time_stats.scope("output conversion"):
                vo = self._convert_output(out)
            po = self.params.odometry
            if po.freezeOnFailedTracking:
                # freeze the published pose while tracking is failed
                # (reference: control.cpp:124-128)
                if vo.status == 2 and self._frozen is not None:
                    vo.position, vo.orientation, vo.velocity = self._frozen
                elif vo.status != 2:
                    self._frozen = (vo.position, vo.orientation, vo.velocity)
            if self.output_buffer is not None:
                self.output_buffer.add_processed_frame(vo)
                while True:
                    buffered = self.output_buffer.poll_output()
                    if buffered is None:
                        break
                    self.on_output(buffered)
            else:
                self.on_output(vo)

    def _handle_status_and_reset(self, out) -> None:
        """Status latch + auto-reset table (reference: control.cpp:117-150).

        Latch: any non-INIT session status is adopted as-is; the published
        status never demotes back to INIT (a freshly reset session reports
        INIT while the API keeps the latched status).

        Reset table — first matching row wins:

          status   condition                                   action
          INIT     resetUntilInitSucceeds and timer expired    reset, fresh pose
          any      resetOnFailedTracking and session LOST      reset, keep pose
          >INIT    session reports INIT and timer expired      reset, keep pose

        where `timer expired` = more than resetAfterTrackingFailsToInitialize
        seconds since the last reset.
        """
        po = self.params.odometry
        session_status = int(out.tracking_status)
        if session_status != 0:
            self._status = session_status

        t = float(out.t)
        timer_expired = (self._last_reset_time
                         + po.resetAfterTrackingFailsToInitialize < t)
        if self._status == 0 and po.resetUntilInitSucceeds and timer_expired:
            self.reset(keep_pose=False, t=t)
        elif po.resetOnFailedTracking and session_status == 2:
            self.reset(keep_pose=True, t=t)
        elif self._status != 0 and session_status == 0 and timer_expired:
            self.reset(keep_pose=True, t=t)

    def attribute_stages(self, reps: int = 5) -> dict:
        """Fill in per-stage attribution for the `-timer` report IF the
        per-frame accumulation did not run (the sub-stage labels normally
        accumulate one sample per frame during the run via StageProbes —
        the reference's accumulate-every-frame semantics,
        util/timer.hpp:15-55 + main.cpp:1008-1016). Kept as a fallback for
        sessions where time_stats was enabled only at exit; times the
        sub-programs on the LAST frame's data. Returns the {label: ms} dict."""
        if self._stage_probes is not None:
            return {}  # per-frame samples already accumulated in time_stats
        gray, second = (self._norm_gray(i) for i in self._last_images)
        if gray is None:
            return {}
        from ..utils.stage_attribution import attribute_stages

        try:
            labels = attribute_stages(self.params, self.cameras, gray, second,
                                      reps=reps)
        except Exception:  # attribution must never kill the exit report
            import traceback

            traceback.print_exc()
            return {}
        for k, ms in labels.items():
            self.time_stats.add_attribution(k, ms)
        return labels

    def lock_biases(self) -> None:
        """Freeze IMU bias estimates (reference: InternalAPI::lockBiases,
        internal.hpp:246; ekf.cpp:944-947). No-op before the first frame."""
        if self._state is not None:
            from ..ekf import lock_biases as _lb

            self._state = self._state._replace(
                backend=self._state.backend._replace(
                    ekf=_lb(self._state.backend.ekf, self._sqrt_mode)))

    def condition_on_last_pose(self) -> None:
        """Schur-condition the state on the newest pose (reference:
        InternalAPI::conditionOnLastPose, internal.hpp:247; ekf.cpp:928-942).
        No-op before the first frame."""
        if self._state is not None:
            from ..ekf import condition_on_last_pose as _cp

            self._state = self._state._replace(
                backend=self._state.backend._replace(
                    ekf=_cp(self._state.backend.ekf,
                            self.params.odometry.cameraTrailLength,
                            self._sqrt_mode)))

    def _get_display_rectify(self):
        """Cached stereo rectification for the display/point-cloud paths:
        (map0, map1, Q, rect_cam0, rect_cam1). Uses the same zoom as the
        pipeline's rectifier so overlays line up with tracker pixels."""
        if not hasattr(self, "_display_rectify"):
            import numpy as _np

            from ..frontend.rectify import build_remap, stereo_rectify

            i2c0 = _np.asarray(self.derived.imu_to_camera, _np.float64)
            i2c1 = _np.asarray(self.derived.second_imu_to_camera, _np.float64)
            rc0, rc1, Q, _, _ = stereo_rectify(
                self.cameras[0], self.cameras[1], i2c0, i2c1,
                self.width, self.height,
                zoom=self.params.tracker.rectificationZoom)
            m0 = build_remap(self.cameras[0], rc0, self.width, self.height)
            m1 = build_remap(self.cameras[1], rc1, self.width, self.height)
            self._display_rectify = (m0, m1, _np.asarray(Q), rc0, rc1)
        return self._display_rectify

    def set_visualization(self, mode) -> None:
        """Select the per-frame video visualization (reference:
        InternalAPI::setVisualization, internal.hpp:287; modes
        internal.hpp:66-81 = api.visualizations.VisualizationMode)."""
        from .visualizations import VisualizationMode

        self._visualization = VisualizationMode(int(mode))

    def render_visualization(self, mode=None, epipolar_select=None):
        """Raster for the selected (or given) VisualizationMode from the last
        processed frame's tagged payload (reference: the TaggedFrame-fed
        visualization path, api.cpp getVisualization + visualizations.cpp).
        Returns an (H, W, 3) float RGB array, or None when mode is NONE or no
        frame has been processed yet."""
        import numpy as _np

        from .visualizations import (VisualizationMode,
                                     render_video_visualization)

        mode = VisualizationMode(int(self._visualization if mode is None
                                     else mode))
        if epipolar_select is None:
            # reference: StereoEpipolarVisualization selection comes from
            # tracker.saveStereoEpipolar (set by the display cmd flag)
            sel = str(self.params.tracker.saveStereoEpipolar or "TRACKED").upper()
            epipolar_select = sel if sel != "NONE" else "TRACKED"
        fo = self.last_frame_output
        gray, second = (self._norm_gray(i) for i in self._last_images)
        if mode == VisualizationMode.NONE or gray is None:
            return None
        kw = {}
        if fo is not None:
            px = _np.asarray(fo.track_pixels)
            kw.update(
                track_pixels=px[:, 0, :],
                track_prev_pixels=_np.asarray(fo.track_prev_pixels)[:, 0, :],
                track_status=_np.asarray(fo.track_status),
                track_valid=_np.asarray(fo.track_ids) >= 0,
                stereo_pixels=px[:, 1, :] if px.shape[1] > 1 else None,
            )
        cam_first, cam_second = self.cameras[0], (
            self.cameras[1] if len(self.cameras) > 1 else None)
        needs_rect = (len(self.cameras) > 1 and (
            self.params.tracker.useRectification
            or mode in (VisualizationMode.STEREO_DISPARITY,
                        VisualizationMode.STEREO_DEPTH)))
        if needs_rect:
            # with useRectification the tracker (and hence fo.track_pixels)
            # operates on the RECTIFIED images/cameras, so overlays must be
            # drawn on the remapped frames with the rectified cameras;
            # disparity/depth always require the rectified pair (reference:
            # stereo_disparity.cpp operates post-rectify). The rectified
            # Camera objects carry the rectifying rotation, so pixel rays
            # stay in the ORIGINAL camera frames and T10 is unchanged.
            import jax.numpy as _jnp

            from ..frontend.rectify import remap

            m0, m1, Q, rc0, rc1 = self._get_display_rectify()
            gray = _np.asarray(remap(_jnp.asarray(gray, _jnp.float32), m0))
            if second is not None:
                second = _np.asarray(remap(_jnp.asarray(second, _jnp.float32), m1))
            cam_first, cam_second = rc0, rc1
            kw["Q"] = Q
        if cam_second is not None:
            i2c0 = _np.asarray(self.derived.imu_to_camera, _np.float64)
            i2c1 = _np.asarray(self.derived.second_imu_to_camera, _np.float64)
            kw.update(cam_first=cam_first, cam_second=cam_second,
                      T10=i2c1 @ _np.linalg.inv(i2c0))
        return render_video_visualization(mode, gray, second_gray=second,
                                  epipolar_select=epipolar_select, **kw)

    def reset(self, keep_pose: bool = False, t: Optional[float] = None) -> None:
        """(reference: Control::reset)"""
        import jax.numpy as jnp

        from ..ekf import ORI, POS, transform_to, initialize_orientation

        self._last_reset_time = t if t is not None else 0.0
        old = self._state
        if old is None:
            return
        pos = np.asarray(old.backend.ekf.m[POS:POS + 3])
        q = np.asarray(old.backend.ekf.m[ORI:ORI + 4])
        # rebuild: fresh backend state, keep the tracker image context
        fresh_backend = None
        new = self._init_fn(
            jnp.zeros((self.height, self.width), jnp.float32), t0=self._last_reset_time)
        state = old._replace(backend=new.backend)
        if keep_pose:
            po = self.params.odometry
            ekf = state.backend.ekf
            ekf = initialize_orientation(ekf, jnp.asarray([0.0, 0.0, 9.819], self._dtype),
                                         po.noiseInitialOri, po.noiseScale**2,
                                         self._sqrt_mode)
            ekf = transform_to(ekf, jnp.asarray(pos, self._dtype),
                               jnp.asarray(q, self._dtype), po.cameraTrailLength,
                               sqrt_mode=self._sqrt_mode)
            state = state._replace(
                backend=state.backend._replace(
                    ekf=ekf, orientation_initialized=jnp.ones((), bool)))
        self._state = state

    def _convert_output(self, out) -> VioOutput:
        pc_ids = np.asarray(out.point_cloud_ids)
        pc = np.asarray(out.point_cloud)
        sel = pc_ids >= 0
        cloud = np.concatenate(
            [pc_ids[sel, None].astype(np.float64), pc[sel]], axis=1) if sel.any() else np.zeros((0, 4))
        depth = np.asarray(getattr(out, "track_depth", np.zeros(0)))
        if depth.size and (depth > 0).any():
            # dense-stereo depth points, world coords (reference: merged point
            # cloud with PointFeature::Status::STEREO, backend.cpp:1318-1362)
            import jax.numpy as jnp
            from ..geometry.poses import to_camera_to_world

            dsel = (depth > 0) & (np.asarray(out.track_ids) >= 0)
            norm = np.asarray(out.track_norm)[dsel]
            z = depth[dsel][:, None]
            p_cam = np.concatenate([norm * z, z], axis=1)
            c2w = np.asarray(to_camera_to_world(
                jnp.asarray(out.position), jnp.asarray(out.orientation),
                jnp.asarray(self.derived.imu_to_camera)))
            p_w = p_cam @ c2w[:3, :3].T + c2w[:3, 3]
            ids = np.asarray(out.track_ids)[dsel][:, None].astype(np.float64)
            stereo_cloud = np.concatenate([ids, p_w], axis=1)
            cloud = np.concatenate([cloud, stereo_cloud]) if len(cloud) else stereo_cloud
        if (self.params.tracker.computeStereoPointCloud
                and self._last_images[1] is not None):
            # full strided disparity point cloud merged into the output cloud
            # (reference: tracker.cpp:792 getStereoPointCloud ->
            # backend.cpp:1328-1360 merge, stride = stereoPointCloudStride);
            # synthetic id -2 marks dense-stereo points (no track identity)
            import jax.numpy as jnp

            from ..frontend.disparity import (compute_disparity,
                                              default_max_disparity,
                                              point_cloud)
            from ..frontend.rectify import remap
            from ..geometry.poses import to_camera_to_world

            m0, m1, Q, _, _ = self._get_display_rectify()
            gl = remap(jnp.asarray(self._norm_gray(self._last_images[0])), m0)
            gr = remap(jnp.asarray(self._norm_gray(self._last_images[1])), m1)
            disp, dv = compute_disparity(gl, gr,
                                         default_max_disparity(self.width))
            pts, ok = point_cloud(disp, dv, jnp.asarray(Q),
                                  stride=max(int(self.params.tracker.stereoPointCloudStride), 1))
            pts, ok = np.asarray(pts), np.asarray(ok)
            if ok.any():
                c2w = np.asarray(to_camera_to_world(
                    jnp.asarray(out.position), jnp.asarray(out.orientation),
                    jnp.asarray(self.derived.imu_to_camera)))
                p_w = pts[ok] @ c2w[:3, :3].T + c2w[:3, 3]
                dense = np.concatenate(
                    [np.full((len(p_w), 1), -2.0), p_w], axis=1)
                cloud = np.concatenate([cloud, dense]) if len(cloud) else dense
        trail = np.concatenate([
            np.asarray(out.pose_trail_times)[:, None], np.asarray(out.pose_trail)], axis=1)
        position = np.asarray(out.position)
        orientation = np.asarray(out.orientation)
        velocity = np.asarray(out.velocity)
        if self.params.odometry.outputCameraPose:
            # output the first camera pose instead of the IMU pose
            # (reference: odometry.outputCameraPose -> imuToOutput,
            # tracker/util.cpp:106-108)
            import jax.numpy as jnp
            from ..geometry.poses import to_camera_to_world
            from ..geometry.quaternion import rmat_to_quat

            c2w = np.asarray(to_camera_to_world(
                jnp.asarray(position), jnp.asarray(orientation),
                jnp.asarray(self.derived.imu_to_output)))
            position = c2w[:3, 3]
            orientation = np.asarray(rmat_to_quat(jnp.asarray(c2w[:3, :3].T)))
        if self.slam is not None and self.slam.coord.ready:
            # SLAM-corrected outputs (reference: computePose, backend.cpp:1364-1381)
            position, orientation = self.slam.coord.transform_position_orientation(
                position, orientation)
            velocity = self.slam.coord.T[:3, :3] @ velocity
            if len(cloud):
                cloud = cloud.copy()
                cloud[:, 1:4] = (self.slam.coord.T[:3, :3] @ cloud[:, 1:4].T).T + self.slam.coord.T[:3, 3]
            # merge SLAM map points (reference: getPointCloud, backend.cpp:255-280)
            if self.slam.point_cloud:
                slam_pts = np.array([
                    [-pid, p[0], p[1], p[2]] for pid, tid, p in self.slam.point_cloud])
                cloud = np.concatenate([cloud, slam_pts]) if len(cloud) else slam_pts
        return VioOutput(
            status=int(out.tracking_status),
            t=float(out.t),
            position=position,
            orientation=orientation,
            velocity=velocity,
            position_covariance=np.asarray(out.position_cov),
            velocity_covariance=np.asarray(out.velocity_cov),
            bias_covariance_diagonal=np.asarray(out.bias_cov_diag),
            point_cloud=cloud,
            pose_trail=trail,
            bias_gyro=np.asarray(out.bias_gyro),
            bias_acc=np.asarray(out.bias_acc),
            stationary_visual=bool(out.stationary_visual),
        )


def build_vio(calibration_json: Optional[str] = None,
              config_yaml: Optional[str] = None,
              width: int = 640, height: int = 480, **kwargs) -> VioApi:
    """Factory matching the reference buildVio(calibrationJson, configYaml)
    (reference: src/api/vio.hpp:122, api.cpp:1027-1039)."""
    params = load_parameters(yaml_text=config_yaml, calibration_json=calibration_json)
    return VioApi(params, width, height, **kwargs)
