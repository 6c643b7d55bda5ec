"""Benchmark-grade long textured-world accuracy protocol.

The 59-frame 320x240 textured probe (eval/textured_probe.py) proves the
front-end survives realistic imaging; it is not benchmark-grade evidence.
This module is: it runs the full jitted VIO (and the complete VioApi + async
SLAM stack for the vislam family) over LONG textured ray-cast sequences —
default 60 s / 600 frames — at the benchmark resolutions (752x480 pinhole
mono/stereo, 512x512 KB4 fisheye), on a multi-lap revisit trajectory
(~3.7 laps of the textured cylinder world in 60 s, so the same scenery is
re-seen every ~16 s with naturally broken tracks in between).

It stands in for the reference's real-dataset protocol (reference:
README.md:72-83 — full EuRoC/TUM-VI sequences, minutes long, with revisits)
with in-repo data of the same shape: long duration, revisits, occlusion,
exposure jitter, pixel noise, motion blur. Frames render on-device via the
jitted ray caster (io/textured_jax.py) so the protocol is practical at
752x480.

Used by bench.py (folded into the default bench output as
extra.textured_long) and by tests/ at reduced shapes.
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np

KB4_LONG = (0.0035, 0.0007, -0.002, 0.0002)  # bench fisheye family coeffs


def long_probe_params(family: str = "stereo", overrides: Optional[dict] = None):
    """Parameters + geometry for a long-probe family.

    Returns (Parameters, width, height, fx, fisheye_coeffs_or_None).

    Starts from the bench preset (models.synthetic_bench_params — the
    headline configuration) and applies the textured-world measurement-noise
    tuning from the short probe (eval/textured_probe.py: LK on motion-blurred
    texture is noisier than on blob renders; the reference applies the same
    per-dataset tuning via parameters.txt)."""
    from ..models import synthetic_bench_params

    base = "stereo" if family in ("vislam", "stereo_api") else family
    p = synthetic_bench_params(base)
    if family == "vislam":
        p.slam.useSlam = True
        p.slam.applyLoopClosures = True
        p.slam.keyframeCandidateInterval = 4
    # textured-world noise tuning (same rationale as textured_accuracy_params)
    p.odometry.visualR = 0.5
    if family == "fisheye":
        W = H = 512
        fx = 190.0
        coeffs = KB4_LONG
    else:
        W, H = 752, 480
        fx = 458.0
        coeffs = None
    for k, v in (overrides or {}).items():
        g, n = k.split(".")
        p.set_parameter(g, n, v)
    return p, W, H, fx, coeffs


class _FrameCache:
    """Chunked on-demand renderer: renders [c*chunk, (c+1)*chunk) frames via
    the jitted ray caster on first access, holds only the current chunk per
    camera (so a 600-frame 752x480 stereo run never materializes 1.7 GB).

    Frames stay ON DEVICE (render_sequence device=True) and get() returns
    device slices: a D2H + H2D round trip through the TPU tunnel costs
    ~0.3 s/frame, which would dominate the whole protocol."""

    def __init__(self, seq, renderers, chunk: int = 32):
        self.seq = seq
        self.renderers = renderers  # tuple of render_sequence fns
        self.chunk = chunk
        self._cur = (-1, None)  # (chunk_index, tuple of (chunk, H, W) arrays)

    def get(self, fi: int):
        """-> tuple of (H, W) float32 DEVICE arrays, one per camera."""
        c = fi // self.chunk
        self._ensure(c)
        off = fi - self._cur[0] * self.chunk
        return tuple(imgs[off] for imgs in self._cur[1])

    def _ensure(self, c: int):
        if self._cur[0] != c:
            lo = c * self.chunk
            hi = min(lo + self.chunk, len(self.seq.frame_sample_idx))
            idx = np.arange(lo, hi)
            self._cur = (c, tuple(
                r(self.seq, idx, chunk=self.chunk, device=True)
                for r in self.renderers))

    def get_range(self, lo: int, hi: int):
        """-> tuple of (hi-lo, H, W) DEVICE arrays, one per camera; the
        range must lie within one chunk (the lax.scan driver consumes whole
        cached chunks, so no extra copies are made)."""
        c = lo // self.chunk
        assert (hi - 1) // self.chunk == c, "range spans chunks"
        self._ensure(c)
        off = lo - c * self.chunk
        return tuple(imgs[off:off + (hi - lo)] for imgs in self._cur[1])


def _build_world(family: str, seq, W: int, H: int, fx: float, coeffs,
                 seed: int, scene_kwargs: Optional[dict] = None):
    """(renderers tuple, second_imu_to_camera or None) for the family."""
    from ..io.synthetic import SYNTH_IMU_TO_CAMERA
    from ..io.textured import TexturedScene
    from ..io.textured_jax import make_textured_renderer

    scene = TexturedScene(seed=seed, wall_radius=6.0, **(scene_kwargs or {}))
    render_kw = dict(exposure_jitter=0.05, pixel_noise=0.01, motion_blur=True,
                     fisheye_coeffs=coeffs)
    rl = make_textured_renderer(scene, SYNTH_IMU_TO_CAMERA, fx, fx,
                                W / 2, H / 2, W, H, **render_kw)
    if family in ("stereo", "vislam", "stereo_api"):
        second = np.asarray(SYNTH_IMU_TO_CAMERA).copy()
        second[0, 3] = -0.11  # EuRoC-like baseline (bench preset)
        rr = make_textured_renderer(scene, second, fx, fx, W / 2, H / 2,
                                    W, H, **render_kw)
        return (rl, rr), second
    return (rl,), None


def _make_sequence(duration: float, seed: int, frame_rate: float,
                   imu_rate: float):
    from ..io.synthetic import generate_sequence

    return generate_sequence(duration=duration, imu_rate=imu_rate,
                             frame_rate=frame_rate, gyro_noise=5e-4,
                             acc_noise=5e-3, seed=seed, radius=2.0)


def run_long_probe(family: str = "stereo", duration: float = 60.0,
                   seed: int = 8, frame_rate: float = 10.0,
                   imu_rate: float = 100.0, chunk: int = 32,
                   overrides: Optional[dict] = None,
                   width: Optional[int] = None, height: Optional[int] = None,
                   fx: Optional[float] = None,
                   scene_kwargs: Optional[dict] = None,
                   dtype=None) -> dict:
    """Run one family of the long textured protocol end to end.

    family: "mono" | "stereo" | "fisheye" (jitted VIO loop) | "vislam"
    (complete VioApi + async SLAM) | "stereo_api" (the SAME stereo run as
    "stereo" but driven through the full VioApi + sample-sync host layer with
    SLAM off — so the API path has benchmark-scale accuracy evidence, not
    just the jitted loop; reference hot path is always through the API,
    api.cpp:528-628).

    Returns {"ate_rmse_m", "frames", "duration_s", "finite", "resolution",
    "wall_s"}; vislam adds SLAM fields, API families add fps_steady.
    Matmul precision is pinned to 'highest' (the production/bench EKF
    mode)."""
    import os

    import jax

    # persistent compilation cache: the 752x480 renderer + VIO programs cost
    # minutes to compile over the TPU tunnel but are identical across runs
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    with jax.default_matmul_precision("highest"):
        if family in ("vislam", "stereo_api"):
            return _run_api(family, duration, seed, frame_rate, imu_rate,
                            chunk, overrides, width, height, fx, scene_kwargs)
        return _run_jitted(family, duration, seed, frame_rate, imu_rate,
                           chunk, overrides, width, height, fx, scene_kwargs,
                           dtype=dtype)


def _geometry(family, overrides, width, height, fx):
    p, W, H, FX, coeffs = long_probe_params(family, overrides)
    if width is not None:
        # reduced-shape mode (CPU tests): rescale intrinsics consistently
        scale = width / W
        W, H = width, (height or int(round(H * width / 752)))
        FX = fx if fx is not None else FX * scale
        p.tracker.focalLength = FX
        p.tracker.principalPointX = W / 2
        p.tracker.principalPointY = H / 2
        p.tracker.gfttMinDistance = max(p.tracker.gfttMinDistance * scale, 8.0)
    return p, W, H, FX, coeffs


def _run_jitted(family, duration, seed, frame_rate, imu_rate, chunk,
                overrides, width, height, fx, scene_kwargs,
                dtype=None) -> dict:
    """dtype: filter/front-end dtype; f32 (the production TPU mode) unless
    overridden (f64 anchor runs need jax x64 enabled and a CPU backend)."""
    import jax
    import jax.numpy as jnp

    from ..config import DerivedParameters
    from ..eval.ate import ate_rmse
    from ..geometry.cameras import build_camera_from_params
    from ..odometry.backend import ImuBatch
    from ..odometry.vio import make_vio

    p, W, H, FX, coeffs = _geometry(family, overrides, width, height, fx)
    dtype = dtype or jnp.float32
    derived = DerivedParameters.from_parameters(p)
    cams = [build_camera_from_params(p.tracker, W, H, dtype=dtype)]
    if p.tracker.useStereo:
        cams.append(build_camera_from_params(p.tracker, W, H, second=True,
                                             dtype=dtype))
    cams = tuple(cams)

    seq = _make_sequence(duration, seed, frame_rate, imu_rate)
    renderers, _ = _build_world(family, seq, W, H, FX, coeffs, seed,
                                scene_kwargs)
    frames = _FrameCache(seq, renderers, chunk=chunk)

    init_fn, vio_step_raw = make_vio(p, derived, cams,
                                     max_tracks=p.tracker.maxTracks,
                                     dtype=dtype)
    vio_step = jax.jit(vio_step_raw)

    F = len(seq.frame_sample_idx)
    f0 = tuple(jnp.asarray(im, dtype) for im in frames.get(0))
    state = init_fn(f0[0], t0=float(seq.frame_times[0]),
                    second_image=f0[1] if len(f0) > 1 else None)
    prev = seq.frame_sample_idx[0] + 1
    S_max = int(np.max(np.diff(np.concatenate([[0],
                                               seq.frame_sample_idx + 1]))))

    def imu_for(fi, prev):
        k = seq.frame_sample_idx[fi] + 1
        n = k - prev
        pad = S_max - n
        t = np.pad(seq.times[prev:k], (0, pad),
                   constant_values=seq.times[k - 1])
        g = np.pad(seq.gyro[prev:k], ((0, pad), (0, 0)))
        a = np.pad(seq.acc[prev:k], ((0, pad), (0, 0)))
        valid = np.arange(S_max) < n
        return (t, g, a, valid), k

    # chunked lax.scan over the cached device-resident frame chunks: one
    # device dispatch per chunk instead of one per frame. The scan body is
    # the same vio_step, so trajectories are unchanged (test-enforced:
    # test_long_probe_api.py test_long_probe_scan_matches_eager).
    # DEFAULT OFF: on the axon remote-TPU platform the compile helper does
    # not hit the persistent compilation cache, so the scan's extra trace
    # lengths recompile every process and cost more than the dispatch they
    # save (measured: 60 s stereo leg 107.7 s scan vs 58.8 s eager). On a
    # TPU with a working compile cache set HYBVIO_LONG_SCAN=1.
    import os as _os

    use_scan = _os.environ.get("HYBVIO_LONG_SCAN", "0") != "0"

    t_start = time.perf_counter()
    est = []
    if use_scan:
        def chunk_scan(st, imu_stack, frame_stacks):
            def body(s, xs):
                imu, imgs = xs
                s, out = vio_step_raw(s, ImuBatch(*imu), *imgs)
                return s, out.position

            return jax.lax.scan(body, st, (imu_stack, frame_stacks))

        chunk_scan = jax.jit(chunk_scan)
        lo = 1
        while lo < F:
            hi = min(((lo // chunk) + 1) * chunk, F)
            imus = []
            for fi in range(lo, hi):
                b, prev = imu_for(fi, prev)
                imus.append(b)
            imu_stack = tuple(
                jnp.asarray(np.stack([b[i] for b in imus]), dtype
                            if i < 3 else bool)
                for i in range(4))
            frame_stacks = tuple(
                s.astype(dtype) for s in frames.get_range(lo, hi))
            state, pos = chunk_scan(state, imu_stack, frame_stacks)
            est.append(np.asarray(pos))
            lo = hi
        est = np.concatenate(est)
    else:
        for fi in range(1, F):
            b, prev = imu_for(fi, prev)
            batch = ImuBatch(jnp.asarray(b[0], dtype),
                             jnp.asarray(b[1], dtype),
                             jnp.asarray(b[2], dtype), jnp.asarray(b[3]))
            imgs = tuple(jnp.asarray(im, dtype) for im in frames.get(fi))
            state, out = vio_step(state, batch, *imgs)
            # keep positions ON DEVICE: a per-frame value fetch costs one
            # link round trip (~32 ms over the TPU tunnel) and serializes
            # the async dispatch chain; one stacked fetch at the end costs
            # one
            est.append(out.position)
        est = np.asarray(jnp.stack(est))
    wall = time.perf_counter() - t_start

    finite = bool(np.isfinite(est).all())
    gt = seq.pos[seq.frame_sample_idx[1:F]] - seq.pos[0]
    ate = float(ate_rmse(est, gt)) if finite else float("nan")
    return {"ate_rmse_m": round(ate, 4) if finite else None,
            "frames": F - 1, "duration_s": round(duration, 1),
            "finite": finite, "resolution": f"{W}x{H}",
            "wall_s": round(wall, 1)}


def _run_api(family, duration, seed, frame_rate, imu_rate, chunk, overrides,
             width, height, fx, scene_kwargs) -> dict:
    """Full-API long run: complete VioApi stack — sample sync (native C++
    by default), jitted stereo VIO step, and for family="vislam" the async
    SLAM worker (keyframes, BoW retrieval, loop closure, BA). Steady-state
    FPS excludes both compile warmup and the finish() teardown (the
    end-of-run global pose graph + BA sweeps), which is reported separately
    — folding teardown into FPS made the number incomparable to the other
    configs (VERDICT round-2 weak item 8)."""
    import jax.numpy as jnp

    from ..api.vio import VioApi
    from ..eval.ate import ate_rmse

    p, W, H, FX, coeffs = _geometry(family, overrides, width, height, fx)
    seq = _make_sequence(duration, seed, frame_rate, imu_rate)
    renderers, _ = _build_world(family, seq, W, H, FX, coeffs, seed,
                                scene_kwargs)
    frames = _FrameCache(seq, renderers, chunk=chunk)

    if family == "vislam":
        # per-keyframe SLAM stage attribution (reference: slam::TIME_STATS)
        from ..utils.timer import SLAM_TIME_STATS

        SLAM_TIME_STATS.reset()
        SLAM_TIME_STATS.enabled = True

    api = VioApi(p, W, H, dtype=jnp.float32)
    outputs = []
    api.on_output = outputs.append

    F = len(seq.frame_sample_idx)
    frame_at = {int(k): fi for fi, k in enumerate(seq.frame_sample_idx)}
    warmup_frames = 3
    t0 = None
    n_fed = 0
    for k in range(int(seq.frame_sample_idx[F - 1]) + 1):
        api.add_gyro(seq.times[k], seq.gyro[k])
        api.add_acc(seq.times[k], seq.acc[k])
        fi = frame_at.get(k)
        if fi is not None:
            fr = frames.get(fi)
            api.add_frame_stereo(seq.times[k], fr[0], fr[1])
            n_fed += 1
            if n_fed == warmup_frames:
                t0 = time.perf_counter()  # steady state: after compile
    t_end = time.perf_counter()
    api.finish()
    teardown_s = time.perf_counter() - t_end
    steady = max(n_fed - warmup_frames, 1)
    fps = steady / max(t_end - (t0 or t_end), 1e-9)

    est = np.stack([np.asarray(o.position) for o in outputs])
    est_t = np.array([o.t for o in outputs])
    finite = bool(np.isfinite(est).all())
    gt = np.stack([np.interp(est_t, seq.times, seq.pos[:, i] - seq.pos[0, i])
                   for i in range(3)], axis=1)
    ate = float(ate_rmse(est, gt)) if finite else float("nan")
    out = {"ate_rmse_m": round(ate, 4) if finite else None,
           "frames": n_fed, "duration_s": round(duration, 1),
           "finite": finite, "resolution": f"{W}x{H}",
           "fps_steady": round(fps, 2),
           "teardown_s": round(teardown_s, 2),
           "native_sync": type(api.sample_sync).__name__ == "NativeSampleSync"}
    if family == "vislam":
        from ..utils.timer import SLAM_TIME_STATS

        slam = api.slam.slam if api.slam else None
        out.update({"keyframes": len(slam.kf_order) if slam else 0,
                    "loop_events": len(slam.loop_events) if slam else 0,
                    "map_points": len(slam.points) if slam else 0,
                    # candidates dropped by the bounded non-blocking ingest
                    # policy (slam_coupling.py): nonzero means the SLAM host
                    # worker was starved (e.g. CPU contention) and the
                    # keyframe/loop counts undercount the design's capability
                    "dropped_candidates": api.slam.dropped if api.slam else 0,
                    # per-keyframe SLAM worker stage means, ms
                    "slam_ms_per_kf": {
                        k: round(v, 1) for k, v in
                        SLAM_TIME_STATS.per_frame_timings().items()}})
        SLAM_TIME_STATS.enabled = False
    return out
