#!/usr/bin/env python
"""Benchmark: single-chip VIO throughput on synthetic EuRoC-like sequences.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is relative to the 200 FPS/chip target (BASELINE.json: >10x
real-time stereo EuRoC per TPU chip).

Modes (env BENCH_MODE):
  batched (default): B independent sequences vmapped on one chip — the
    reference's "all EuRoC sequences in parallel" offline benchmark
    (BASELINE.json config 5); reports AGGREGATE frames/sec/chip.
  single: one sequence; reports per-frame latency FPS.

Configs (env BENCH_CONFIG): stereo (default — the BASELINE.json headline
metric is stereo FPS/chip) | mono | fisheye | vislam (-useSlam through the
full VioApi with the async SLAM backend) — the BASELINE.json configuration
families on the same synthetic world.

Env: BENCH_FRAMES (default 300), BENCH_BATCH (default 16),
BENCH_LK_LEVELS/BENCH_LK_ITERS (LK depth sweeps).
Runs on whatever jax.default_backend() provides (the TPU chip under the
driver; CPU locally with JAX_PLATFORMS=cpu). Uses float32 on device.
"""
import json
import os
import sys
import threading
import time

import numpy as np

STEREO_BASELINE = 0.11
KB4 = (0.0035, 0.0007, -0.002, 0.0002)

# ---------------------------------------------------------------------------
# Wall-clock budget + guaranteed output (round-4 post-mortem: the driver's
# bench run hit its external timeout -> rc=124 -> NO parsed JSON at all.
# This round the benchmark self-limits: stages run in priority order, each
# gated on the remaining budget, and a watchdog emits the best-so-far JSON
# line and exits if anything (e.g. a TPU-tunnel stall) overruns.)
# ---------------------------------------------------------------------------
T_START = time.monotonic()
# Default budget calibrated against the driver's external timeout: the
# round-3 bench passed at ~900-950 s wall, so the external limit is >=1200 s;
# 1080 + 60 s watchdog grace stays safely inside it.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1080"))
RESULT = {}  # filled progressively; emitted exactly once
_EMITTED = threading.Event()


def elapsed() -> float:
    return time.monotonic() - T_START


def remaining() -> float:
    return BUDGET_S - elapsed()


def emit(tag=None):
    """Print the single JSON result line exactly once."""
    if _EMITTED.is_set() or not RESULT:
        return
    _EMITTED.set()
    if tag:
        RESULT.setdefault("extra", {})["emitted_by"] = tag
    RESULT.setdefault("extra", {})["bench_wall_s"] = round(elapsed(), 1)
    print(json.dumps(RESULT), flush=True)


def _watchdog():
    """Hard backstop: emit partial results and exit at budget + grace."""
    grace = float(os.environ.get("BENCH_WATCHDOG_GRACE_S", "60"))
    while True:
        left = BUDGET_S + grace - elapsed()
        if left <= 0:
            break
        if _EMITTED.is_set():
            return
        time.sleep(min(left, 5.0))
    if not _EMITTED.is_set():
        print("bench: watchdog fired at %.0fs; emitting partial result"
              % elapsed(), file=sys.stderr)
        emit(tag="watchdog")
        sys.stderr.flush()
        sys.stdout.flush()
        os._exit(0)


def start_watchdog():
    """Arm the budget backstop. Called from main() — NOT at import: tools
    that import bench helpers (build_config, build_device_renderer,
    tools/profile_step.py) must not be os._exit'd 19 minutes in."""
    threading.Thread(target=_watchdog, daemon=True).start()


def stage_gate(extra: dict, name: str, est_s: float) -> bool:
    """True if stage `name` (estimated cost est_s) fits the remaining budget;
    records the skip in extra otherwise."""
    if remaining() >= est_s:
        return True
    extra.setdefault("skipped_budget", []).append(
        {"stage": name, "est_s": est_s, "remaining_s": round(remaining(), 1)})
    print("bench: skipping %s (est %.0fs > remaining %.0fs)"
          % (name, est_s, remaining()), file=sys.stderr)
    return False


def build_config(config, jnp):
    """(params, cameras, render_fn, seq_kwargs) for a BASELINE config family.
    render_fn(seq, fi) -> image or (left, right). Parameters come from the
    models/ preset (hybvio_tpu.models.synthetic_bench_params) so the
    headline numbers are reproducible outside this script."""
    from hybvio_tpu.geometry.cameras import build_fisheye, build_pinhole
    from hybvio_tpu.io.synthetic import (
        SYNTH_IMU_TO_CAMERA, render_view, render_view_fisheye,
    )
    from hybvio_tpu.models import synthetic_bench_params

    dtype = jnp.float32
    lk_levels = os.environ.get("BENCH_LK_LEVELS")
    lk_iters = os.environ.get("BENCH_LK_ITERS")
    rcond = os.environ.get("BENCH_RCOND")
    p = synthetic_bench_params(
        config,
        lk_levels=int(lk_levels) if lk_levels else None,
        lk_iters=int(lk_iters) if lk_iters else None,
        rcond=float(rcond) if rcond else None)
    # ad-hoc parameter sweeps without editing the preset, e.g.
    # BENCH_OVERRIDES="odometry.maxVisualUpdates=8,tracker.maxTracks=64"
    for kv in filter(None, os.environ.get("BENCH_OVERRIDES", "").split(",")):
        key, val = kv.split("=")
        group, name = key.split(".")
        cur = getattr(getattr(p, group), name)
        # set_parameter coerces string values per target type (and raises
        # on garbage, unlike a hand-rolled truthiness check)
        p.set_parameter(group, name, float(val) if cur is None else val)
    seq_kwargs = dict(n_landmarks=500, gyro_noise=5e-4, acc_noise=5e-3, seed=0)

    if config == "fisheye":
        # BASELINE config 4 family: KB4 fisheye (TUM-VI-like wide FOV)
        W = H = 512
        FX = 190.0
        seq_kwargs["landmark_radius"] = 5.0
        cam = build_fisheye(FX, FX, W / 2, H / 2, coeffs=KB4,
                            max_valid_fov_deg=150.0, width=W, height=H,
                            dtype=dtype)

        def render(seq, fi):
            k = seq.frame_sample_idx[fi]
            return render_view_fisheye(
                seq.landmarks, seq.pos[k], seq.quat[k], SYNTH_IMU_TO_CAMERA,
                FX, FX, W / 2, H / 2, W, H, KB4, max_fov_deg=150.0,
                blob_sigma=1.4)

        return p, (cam,), render, seq_kwargs

    # EuRoC-like pinhole (mono = BASELINE config 1, stereo = config 2,
    # vislam = config 3)
    W, H = 752, 480
    FX = 458.0
    cam = build_pinhole(FX, FX, W / 2, H / 2, width=W, height=H, dtype=dtype)

    if config in ("stereo", "vislam"):
        second = np.asarray(SYNTH_IMU_TO_CAMERA).copy()
        second[0, 3] = -STEREO_BASELINE

        def render(seq, fi):
            k = seq.frame_sample_idx[fi]
            left = render_view(seq.landmarks, seq.pos[k], seq.quat[k],
                               SYNTH_IMU_TO_CAMERA, FX, FX, W / 2, H / 2,
                               W, H, blob_sigma=1.4)
            right = render_view(seq.landmarks, seq.pos[k], seq.quat[k],
                                second, FX, FX, W / 2, H / 2, W, H,
                                blob_sigma=1.4)
            return left, right

        return p, (cam, cam), render, seq_kwargs

    def render(seq, fi):
        k = seq.frame_sample_idx[fi]
        return render_view(seq.landmarks, seq.pos[k], seq.quat[k],
                           SYNTH_IMU_TO_CAMERA, FX, FX, W / 2, H / 2, W, H,
                           blob_sigma=1.4)

    return p, (cam,), render, seq_kwargs


def build_device_renderer(config, batched=False):
    """Jitted on-device frame renderer for a bench config family
    (io/synthetic_jax.py): same world as build_config's host `render`, but
    rendered as one XLA program per frame with frames staying device-resident
    — host rendering at 752x480 costs ~240 ms/frame, which dominated (and
    round 4: overran) the driver bench budget.

    Returns render(landmarks, pos, quat) -> (C, H, W); vmapped when batched.
    """
    import jax

    from hybvio_tpu.io.synthetic import SYNTH_IMU_TO_CAMERA
    from hybvio_tpu.io.synthetic_jax import make_blob_renderer

    if config == "fisheye":
        W = H = 512
        FX = 190.0
        fn = make_blob_renderer([SYNTH_IMU_TO_CAMERA], FX, FX, W / 2, H / 2,
                                W, H, fisheye_coeffs=KB4, max_fov_deg=150.0)
    else:
        W, H = 752, 480
        FX = 458.0
        cams = [SYNTH_IMU_TO_CAMERA]
        if config in ("stereo", "vislam"):
            second = np.asarray(SYNTH_IMU_TO_CAMERA).copy()
            second[0, 3] = -STEREO_BASELINE
            cams.append(second)
        fn = make_blob_renderer(cams, FX, FX, W / 2, H / 2, W, H)
    return jax.vmap(fn) if batched else fn


def _device_backend_or_cpu(probe_timeout_s: int = 180) -> str:
    """Probe the ambient accelerator in a SUBPROCESS with a hard timeout.

    The remote-TPU tunnel blocks indefinitely inside make_c_api_client when
    its pool grant is held by a dead client; probing in-process would wedge
    the whole benchmark. On probe failure fall back to CPU so the driver
    always gets a JSON line (flagged via extra.backend) instead of a hang."""
    import subprocess

    if os.environ.get("BENCH_PLATFORM"):
        return os.environ["BENCH_PLATFORM"]
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=probe_timeout_s, capture_output=True)
        if r.returncode == 0:
            return ""  # ambient platform is healthy; don't override
    except subprocess.TimeoutExpired:
        pass
    print("bench: accelerator probe failed/hung -> CPU fallback with "
          "reduced shapes", file=sys.stderr)
    return "cpu"


CORE_T = {}  # core-stage phase wall times (diagnosing prestage overhead)


def _mark(name, t0):
    CORE_T[name] = round(time.monotonic() - t0, 1)
    return time.monotonic()


def main():
    import jax

    start_watchdog()
    t0 = time.monotonic()
    platform = _device_backend_or_cpu()
    t0 = _mark("probe", t0)
    if platform:
        jax.config.update("jax_platforms", platform)
        if platform == "cpu":
            # keep the fallback line honest but completable
            os.environ.setdefault("BENCH_FRAMES", "40")
            os.environ.setdefault("BENCH_BATCH", "2")
            os.environ.setdefault("BENCH_TEXTURED", "0")
            os.environ.setdefault("BENCH_LONG", "0")
            os.environ.setdefault("BENCH_H2D", "0")
    import jax.numpy as jnp

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    # Full-f32 matmuls everywhere: the EKF cannot survive bf16 mantissas,
    # and with the shallow-LK front-end the matmul load is small enough that
    # 'highest' costs ~1% vs 'high' while 'high' was observed to destabilize
    # one long sequence (decision-boundary chi2 flips).
    jax.config.update("jax_default_matmul_precision", "highest")

    from hybvio_tpu.config import DerivedParameters
    from hybvio_tpu.eval.ate import ate_rmse
    from hybvio_tpu.io.synthetic import generate_sequence
    from hybvio_tpu.odometry.backend import ImuBatch
    from hybvio_tpu.odometry.vio import make_vio

    n_frames = int(os.environ.get("BENCH_FRAMES", "300"))
    mode = os.environ.get("BENCH_MODE", "batched")
    config = os.environ.get("BENCH_CONFIG", "stereo")
    B = int(os.environ.get("BENCH_BATCH", "16"))
    duration = n_frames / 20.0
    dtype = jnp.float32

    p, cams, render, seq_kwargs = build_config(config, jnp)
    derived = DerivedParameters.from_parameters(p)
    t0 = _mark("imports_build", t0)

    seq = generate_sequence(duration=duration, imu_rate=200.0,
                            frame_rate=20.0, **seq_kwargs)
    t0 = _mark("seqgen", t0)

    F = min(n_frames, len(seq.frame_sample_idx))

    if config == "vislam":
        return run_vislam(p, seq, render, F, jnp)

    # pre-stage frames by rendering ON DEVICE (io/synthetic_jax.py): the
    # timed loop measures the pipeline, not the H2D tunnel or the host
    # renderer (the reference's video reader threads hide decode/upload the
    # same way; the live-ingest stage below measures the real host->device
    # path against the real step)
    render_dev = build_device_renderer(config)
    n_cams = 2 if config in ("stereo", "vislam") else 1

    def dev_frame(fi):
        k = seq.frame_sample_idx[fi]
        out = render_dev(seq.landmarks, seq.pos[k], seq.quat[k])
        if n_cams > 1:
            return tuple(out[i] for i in range(n_cams))
        return out[0]

    frames = [dev_frame(fi) for fi in range(F)]
    jax.block_until_ready(frames[-1])
    t0 = _mark("render_stage", t0)

    def fetch_host_frames(n):
        """First n frames as host float32 arrays (for the live-ingest
        stage, which measures genuine host->device per-step uploads)."""
        def to_host(f):
            if isinstance(f, tuple):
                return tuple(np.asarray(x, np.float32) for x in f)
            return np.asarray(f, np.float32)
        return [to_host(f) for f in frames[:n]]

    if mode == "batched":
        return run_batched(p, derived, cams, seq, frames, F, B, dtype, config,
                           render=render, seq_kwargs=seq_kwargs,
                           fetch_host=fetch_host_frames)

    init_fn, vio_step = make_vio(p, derived, cams,
                                 max_tracks=p.tracker.maxTracks, dtype=dtype)
    vio_step = jax.jit(vio_step)

    S_max = int(np.max(np.diff(np.concatenate([[0], seq.frame_sample_idx + 1]))))

    def batch_for(fi, prev):
        k = seq.frame_sample_idx[fi] + 1
        n = k - prev
        pad = S_max - n
        t = np.pad(seq.times[prev:k], (0, pad), constant_values=seq.times[k - 1])
        g = np.pad(seq.gyro[prev:k], ((0, pad), (0, 0)))
        a = np.pad(seq.acc[prev:k], ((0, pad), (0, 0)))
        valid = np.arange(S_max) < n
        return ImuBatch(
            jnp.asarray(t, dtype), jnp.asarray(g, dtype), jnp.asarray(a, dtype),
            jnp.asarray(valid)), k

    state = init_fn(frames[0], t0=float(seq.frame_times[0]))
    prev = seq.frame_sample_idx[0] + 1

    # pre-stage per-frame IMU batches on device (same rationale as frames:
    # measure the pipeline, not the H2D tunnel; the live path hides uploads
    # behind compute via the prefetching input thread)
    batches = []
    for fi in range(1, F):
        b, prev = batch_for(fi, prev)
        batches.append(jax.device_put(b))
    jax.block_until_ready(batches[-1].t)

    # warmup / compile
    import copy
    warm_state, _ = vio_step(copy.deepcopy(state), batches[0], frames[1])
    jax.block_until_ready(warm_state.backend.ekf.m)

    # timed run; the clock ends on a VALUE fetch of the last step's output
    # (block_until_ready can return at enqueue over the remote-TPU tunnel,
    # which would measure dispatch, not execution; steps chain through
    # `state`, so the last output completing implies all executed)
    positions = []
    t0 = time.perf_counter()
    for fi in range(1, F):
        state, out = vio_step(state, batches[fi - 1], frames[fi])
        positions.append(out.position)
    _ = np.asarray(positions[-1])
    elapsed = time.perf_counter() - t0

    fps = (F - 1) / elapsed
    est = np.asarray(jnp.stack(positions))
    gt = seq.pos[seq.frame_sample_idx[1:F]] - seq.pos[0]
    ate = ate_rmse(est, gt) if np.isfinite(est).all() else float("nan")

    result = {
        "metric": f"synthetic_{config}_vio_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 200.0, 4),
        "extra": {
            "ate_rmse_m": None if not np.isfinite(ate) else round(ate, 4),
            "frames": F - 1,
            "backend": jax.default_backend(),
            "p50_latency_ms": round(1000.0 * elapsed / (F - 1), 2),
        },
    }
    RESULT.update(result)
    emit(tag="single")


def run_batched(p, derived, cams, seq, frames, F, B, dtype, config,
                render=None, seq_kwargs=None, fetch_host=None):
    """Batched offline benchmark: B sequences in parallel on one chip
    (the per-chip throughput mode; cross-sequence batching is the designed
    TPU scaling axis, SURVEY.md section 2). For benchmarking, the B lanes
    replay the same sequence with different RNG/noise; compute is identical
    to B distinct sequences (no cross-lane interaction exists)."""
    import json as _json
    import time as _time

    import jax
    import jax.numpy as jnp

    from hybvio_tpu.eval.ate import ate_rmse
    from hybvio_tpu.odometry.backend import ImuBatch
    from hybvio_tpu.parallel.batched import make_batched_vio

    # shared_frames: one staged copy per frame, broadcast across lanes inside
    # the jitted step (vmap in_axes=None) — B-fold less frame HBM than
    # tiling, which is what caps B on a 16 GB chip (BENCH_SHARED_FRAMES=0
    # restores the tiled path for comparison)
    shared = os.environ.get("BENCH_SHARED_FRAMES", "1") != "0"
    batched_init, batched_step = make_batched_vio(
        p, derived, cams, batch_size=B, max_tracks=p.tracker.maxTracks,
        dtype=dtype, shared_frames=shared)

    rng = np.random.RandomState(1)

    def tile(frame):
        if shared:
            return frame  # already staged unbatched by the caller
        if isinstance(frame, tuple):
            return tuple(jax.device_put(jnp.broadcast_to(f, (B,) + f.shape))
                         for f in frame)
        return jax.device_put(jnp.broadcast_to(frame, (B,) + frame.shape))

    frames = [tile(f) for f in frames]
    states = batched_init(frames[0], np.full(B, float(seq.frame_times[0])),
                          np.arange(B))

    S_max = int(np.max(np.diff(np.concatenate([[0], seq.frame_sample_idx + 1]))))

    def batch_for(fi, prev):
        k = seq.frame_sample_idx[fi] + 1
        n = k - prev
        pad = S_max - n
        t = np.pad(seq.times[prev:k], (0, pad), constant_values=seq.times[k - 1])
        g = np.pad(seq.gyro[prev:k], ((0, pad), (0, 0)))
        a = np.pad(seq.acc[prev:k], ((0, pad), (0, 0)))
        valid = np.arange(S_max) < n
        # tile over lanes with small per-lane IMU noise jitter
        gB = np.stack([g + 1e-4 * rng.randn(*g.shape) for _ in range(B)])
        aB = np.stack([a + 1e-3 * rng.randn(*a.shape) for _ in range(B)])
        return ImuBatch(
            jnp.asarray(np.tile(t, (B, 1)), dtype), jnp.asarray(gB, dtype),
            jnp.asarray(aB, dtype), jnp.asarray(np.tile(valid, (B, 1)))), k

    prev = seq.frame_sample_idx[0] + 1
    # pre-stage per-frame IMU batches (measure the pipeline, not the tunnel)
    batches = []
    tm = time.monotonic()
    for fi in range(1, F):
        b, prev = batch_for(fi, prev)
        batches.append(jax.device_put(b))
    jax.block_until_ready(batches[-1].t)
    tm = _mark("imu_stage", tm)

    warm, _ = batched_step(states, batches[0], frames[1])
    jax.block_until_ready(warm.backend.ekf.m)
    tm = _mark("warmup_compile", tm)

    positions = []
    t0 = _time.perf_counter()
    for fi in range(1, F):
        states, out = batched_step(states, batches[fi - 1], frames[fi])
        positions.append(out.position)
    # end the clock on a VALUE fetch of the last step's output, not
    # block_until_ready: over the remote-TPU tunnel block_until_ready can
    # return at enqueue, which would measure dispatch instead of execution.
    # The steps chain through `states`, so the last output completing means
    # every step completed.
    last_pos = np.asarray(positions[-1])  # the value fetch forces D2H
    elapsed_run = _time.perf_counter() - t0
    del last_pos

    agg_fps = B * (F - 1) / elapsed_run
    # one stacked fetch (a per-element np.asarray loop would pay one link
    # round trip per frame)
    est = np.asarray(jnp.stack(positions))  # (F-1, B, 3)
    gt = seq.pos[seq.frame_sample_idx[1:F]] - seq.pos[0]
    ates = []
    for b_ in range(B):
        lane = est[:, b_, :]
        if np.isfinite(lane).all():
            ates.append(ate_rmse(lane, gt))
    step_elapsed = elapsed_run
    result = {
        "metric": f"synthetic_{config}_vio_batched_fps_per_chip",
        "value": round(agg_fps, 2),
        "unit": "frames/s/chip (aggregate, B=%d, prestaged frames)" % B,
        "vs_baseline": round(agg_fps / 200.0, 4),
        "extra": {
            "batch": B,
            "frames_per_seq": F - 1,
            "step_latency_ms": round(1000.0 * step_elapsed / (F - 1), 2),
            "finite_lanes": len(ates),
            "ate_rmse_m_median": round(float(np.median(ates)), 4) if ates else None,
            "backend": jax.default_backend(),
            "core_wall_s": CORE_T,
        },
    }
    # publish the headline immediately: from here on the watchdog can emit a
    # meaningful line even if a later stage stalls
    RESULT.update(result)
    extra = result["extra"]
    stage_t = extra.setdefault("stage_wall_s", {})

    def run_stage(name, est_s, fn):
        if not stage_gate(extra, name, est_s):
            return
        t0s = time.monotonic()
        try:
            fn()
        except Exception as e:  # a failed extra must not kill the headline
            extra.setdefault("stage_errors", {})[name] = repr(e)[:200]
        stage_t[name] = round(time.monotonic() - t0s, 1)

    def do_scan_throughput():
        # ONE-dispatch offline mode: lax.scan over the staged frame sequence
        # (parallel/batched.py make_batched_scan). The eager loop above pays
        # one device dispatch per frame — over the remote-TPU tunnel that is
        # ~RTT-bound, not compute-bound; the scan measures the chip's actual
        # throughput. Equality with the eager loop is test-enforced
        # (test_parallel.py test_scan_matches_eager_loop).
        from hybvio_tpu.parallel.batched import make_batched_scan

        sinit, srun = make_batched_scan(
            p, derived, cams, batch_size=B, max_tracks=p.tracker.maxTracks,
            dtype=dtype, shared_frames=shared)
        if isinstance(frames[0], tuple):
            frames_stack = tuple(
                jnp.stack([f[i] for f in frames[1:]])
                for i in range(len(frames[0])))
        else:
            frames_stack = jnp.stack(frames[1:])
        imu_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        st = sinit(frames[0], np.full(B, float(seq.frame_times[0])),
                   np.arange(B))
        # warmup (compile)
        st_w, pos_w = srun(st, imu_stack, frames_stack)
        _ = np.asarray(pos_w[-1])
        t0s = _time.perf_counter()
        st2, pos = srun(st, imu_stack, frames_stack)
        last = np.asarray(pos[-1])  # value fetch = completion barrier
        scan_s = _time.perf_counter() - t0s
        del last
        fps_scan = B * (F - 1) / scan_s
        est_s = np.asarray(pos)  # (F-1, B, 3)
        gt_s = seq.pos[seq.frame_sample_idx[1:F]] - seq.pos[0]
        ates_s = [ate_rmse(est_s[:, b_, :], gt_s) for b_ in range(B)
                  if np.isfinite(est_s[:, b_, :]).all()]
        extra["scan_throughput"] = {
            "fps_scan": round(fps_scan, 2),
            "fps_eager_loop": round(agg_fps, 2),
            "scan_step_ms": round(1000.0 * scan_s / (F - 1), 2),
            "finite_lanes": len(ates_s),
            "ate_rmse_m_median": (round(float(np.median(ates_s)), 4)
                                  if ates_s else None),
        }
        # the scan IS the offline benchmark number when it wins: one fused
        # device program over the whole staged sequence (dispatch overhead
        # removed); the eager per-frame number stays in extra
        if fps_scan > RESULT["value"] and len(ates_s) == B:
            RESULT["value"] = round(fps_scan, 2)
            RESULT["vs_baseline"] = round(fps_scan / 200.0, 4)
            RESULT["unit"] = ("frames/s/chip (aggregate, B=%d, prestaged, "
                              "lax.scan offline mode)" % B)
            extra["step_latency_ms"] = round(1000.0 * scan_s / (F - 1), 2)

    # DEFAULT OFF on this driver's platform: the axon remote compiler
    # SIGABRTs on any vmapped (B>=2) track stage under lax.scan / while
    # (bisected round 5: B=1 compiles, B=2 crashes, vmap-of-scan and
    # scan-of-vmap both crash, with and without Pallas), and its compile
    # helper does not hit the persistent cache, so even a successful scan
    # compile would be repaid every run. The machinery is CPU-tested
    # (test_scan_matches_eager_loop) and one env flip away when the
    # platform's compiler matures.
    if os.environ.get("BENCH_SCAN", "0") != "0":
        run_stage("scan_throughput", 140, do_scan_throughput)

    # the long textured accuracy protocol (the benchmark-grade ATE
    # evidence; VERDICT r2 item 1) — legs individually budget-gated.
    # Estimates are round-5 measured wall times on the real chip (warm
    # compilation cache) + margin; priority order puts the comparability
    # anchor (stereo), the flagship full-system config (vislam), and the
    # per-family coverage legs before the statistics legs.
    long_legs1 = long_legs2 = False
    if os.environ.get("BENCH_LONG", "1") != "0":
        extra["textured_long"] = {}
        long_legs1 = long_legs2 = True
    elif os.environ.get("BENCH_TEXTURED", "1") != "0":
        from hybvio_tpu.eval.textured_probe import run_textured_probe

        extra["textured_world"] = run_textured_probe(
            duration=6.0, stereo=(config in ("vislam",)) or config == "stereo",
            fisheye=(config == "fisheye"))
    if long_legs1:
        run_textured_long_staged(extra, run_stage, phase=1)

    def do_live_ingest():
        # live-ingest overlap against the REAL batched step (not a surrogate
        # compute): frames start on the HOST and are uploaded per step,
        # either serially (upload, then step) or double-buffered (a prefetch
        # thread uploads frame k+1 while frame k computes — the
        # io/video.py PrefetchingSource pattern; reference contract:
        # decode/upload hidden behind compute, video_input.cpp:23-58).
        # With shared_frames the per-step upload is ONE frame copy —
        # exactly what the live path ships. Measured over a bounded frame
        # window (BENCH_LIVE_FRAMES) — upload cost per frame is stationary,
        # so a ~60-frame window gives the same per-frame numbers as the
        # full sequence at a fraction of the wall cost.
        import threading

        Fl = min(F, int(os.environ.get("BENCH_LIVE_FRAMES", "61")))
        host_frames = fetch_host(Fl)

        def stage_one(frame):
            if isinstance(frame, tuple):
                return tuple(jax.device_put(jnp.asarray(f)) for f in frame)
            return jax.device_put(jnp.asarray(frame))

        def timed_live(prefetch: bool, host_frames=host_frames):
            st = batched_init(frames[0],
                              np.full(B, float(seq.frame_times[0])),
                              np.arange(B))
            jax.block_until_ready(st.backend.ekf.m)
            slot = {}

            def up(k):
                slot[k] = stage_one(host_frames[k])

            th = None
            if prefetch:
                th = threading.Thread(target=up, args=(1,))
                th.start()
            t0 = _time.perf_counter()
            last = None
            for fi in range(1, Fl):
                if prefetch:
                    th.join()
                    dev = slot.pop(fi)
                    if fi + 1 < Fl:
                        th = threading.Thread(target=up, args=(fi + 1,))
                        th.start()
                else:
                    dev = stage_one(host_frames[fi])
                st, out = batched_step(st, batches[fi - 1], dev)
                last = out.position
            _ = np.asarray(last)  # value fetch = completion barrier
            return _time.perf_counter() - t0

        # upload-only cost of one frame per step; block ONCE at the end (a
        # per-frame value fetch would measure the link RTT per frame, not
        # the transfer bandwidth — transfers complete in order on the
        # stream, so readiness of the last implies all)
        def timed_uploads(src):
            t0 = _time.perf_counter()
            staged = [stage_one(src[fi]) for fi in range(1, Fl)]
            jax.block_until_ready(staged)
            last = staged[-1]
            _ = np.asarray((last[0] if isinstance(last, tuple) else last)[0, :1])
            return _time.perf_counter() - t0

        h2d_s = timed_uploads(host_frames)

        serial_s = timed_live(prefetch=False)
        overlap_s = timed_live(prefetch=True)
        n = Fl - 1
        hidden = (serial_s - overlap_s) / max(h2d_s, 1e-9)
        extra["live_ingest"] = {
            "fps_prestaged": round(agg_fps, 2),
            "fps_live_serial": round(B * n / serial_s, 2),
            "fps_live_prefetch": round(B * n / overlap_s, 2),
            "h2d_ms_per_frame": round(1000.0 * h2d_s / n, 2),
            "step_ms_prestaged": round(1000.0 * step_elapsed / (F - 1), 2),
            "serial_ms_per_frame": round(1000.0 * serial_s / n, 2),
            "overlapped_ms_per_frame": round(1000.0 * overlap_s / n, 2),
            "hidden_frac": round(float(np.clip(hidden, 0.0, 1.0)), 3),
            "frames": n,
        }
        # 8-bit ingestion: the live camera payload is uint8; shipping it raw
        # costs 1/4 the H2D bytes (the step normalizes on device,
        # odometry/vio.py normalize_input — reference likewise ingests 8-bit
        # frames, image.cpp:345-367)
        def to_u8(frame):
            if isinstance(frame, tuple):
                return tuple(to_u8(f) for f in frame)
            return np.clip(np.asarray(frame) * 255.0, 0, 255).astype(np.uint8)

        u8_frames = [to_u8(f) for f in host_frames]
        # warm the uint8-input program variant (jit specializes on dtype)
        # outside the timed region
        st_w = batched_init(frames[0], np.full(B, float(seq.frame_times[0])),
                            np.arange(B))
        _, out_w = batched_step(st_w, batches[0], stage_one(u8_frames[1]))
        jax.block_until_ready(out_w.position)
        h2d_u8_s = timed_uploads(u8_frames)
        serial_u8_s = timed_live(prefetch=False, host_frames=u8_frames)
        overlap_u8_s = timed_live(prefetch=True, host_frames=u8_frames)
        extra["live_ingest"].update({
            "fps_live_serial_u8": round(B * n / serial_u8_s, 2),
            "fps_live_prefetch_u8": round(B * n / overlap_u8_s, 2),
            "h2d_u8_ms_per_frame": round(1000.0 * h2d_u8_s / n, 2),
        })

    # live ingest before the statistics legs (VERDICT r3 item 7); its cost
    # is dominated by the one-time uint8-input program compile (~60 s on
    # axon, which never hits the persistent cache)
    if os.environ.get("BENCH_H2D", "1") != "0" and fetch_host is not None:
        run_stage("live_ingest", 170, do_live_ingest)

    if os.environ.get("BENCH_SEED_DIVERSE", "1") != "0" and render is not None:
        # the ATE statistic over B DISTINCT worlds/trajectories (per-lane
        # seeds + per-lane trajectory geometry) — the shared-frame lanes
        # above are the FPS config; this one exercises per-lane divergence
        # masking at bench scale (SURVEY section 2: the batched config is B
        # distinct sequences)
        run_stage("seed_diverse", 230, lambda: extra.__setitem__(
            "seed_diverse",
            run_seed_diverse(p, derived, cams, F, B, dtype, config, render,
                             seq_kwargs)))

    if long_legs2:
        run_textured_long_staged(extra, run_stage, phase=2)
        run_textured_long_staged(extra, run_stage, phase=3)
    emit(tag="complete")


def run_seed_diverse(p, derived, cams, F, B, dtype, config, render,
                     seq_kwargs):
    """Batched ATE over B DISTINCT sequences (VERDICT r3 item 6).

    Each lane gets its own landmark world (per-lane seed), its own IMU noise
    realization, AND its own trajectory geometry (radius / angular speed /
    z-wobble drawn per lane), so the B-lane median/p90 ATE is a statistic
    over sixteen different worlds rather than sixteen noise-jittered replays
    of seed 0. Frames render ON DEVICE per step (vmapped blob renderer,
    io/synthetic_jax.py — host rendering of B lanes cost ~8 s/step, which
    overran the round-4 driver budget) — this lane measures ACCURACY and
    per-lane reset/divergence masking in the batched program, not FPS (the
    shared-frame run above is the FPS config).
    """
    import jax
    import jax.numpy as jnp

    from hybvio_tpu.eval.ate import ate_rmse
    from hybvio_tpu.io.synthetic import generate_sequence
    from hybvio_tpu.odometry.backend import ImuBatch
    from hybvio_tpu.parallel.batched import make_batched_vio

    F = min(F, int(os.environ.get("BENCH_SEED_DIVERSE_FRAMES", "150")))
    duration = F / 20.0 + 0.25
    seqs = []
    for b_ in range(B):
        lane_rng = np.random.RandomState(7000 + b_)
        kw = dict(seq_kwargs)
        kw["seed"] = 1000 + b_
        seqs.append(generate_sequence(
            duration=duration, imu_rate=200.0, frame_rate=20.0,
            radius=float(lane_rng.uniform(1.7, 2.3)),
            angular_speed=float(lane_rng.uniform(0.34, 0.46)),
            z_wobble=float(lane_rng.uniform(0.10, 0.20)), **kw))
    F = min(F, min(len(s.frame_sample_idx) for s in seqs))
    # the time grid is deterministic (same rates/duration), so frame sample
    # indices are shared across lanes even though trajectories differ
    idx = seqs[0].frame_sample_idx
    times = seqs[0].times

    batched_init, batched_step = make_batched_vio(
        p, derived, cams, batch_size=B, max_tracks=p.tracker.maxTracks,
        dtype=dtype, shared_frames=False)

    render_bat = build_device_renderer(config, batched=True)
    lms = jnp.asarray(np.stack([s.landmarks for s in seqs]), dtype)

    def frames_at(fi):
        k = idx[fi]
        pos = jnp.asarray(np.stack([s.pos[k] for s in seqs]), dtype)
        quat = jnp.asarray(np.stack([s.quat[k] for s in seqs]), dtype)
        out = render_bat(lms, pos, quat)  # (B, C, H, W), device-resident
        if out.shape[1] > 1:
            return tuple(out[:, i] for i in range(out.shape[1]))
        return out[:, 0]

    S_max = int(np.max(np.diff(np.concatenate([[0], idx + 1]))))

    def batch_for(fi, prev):
        k = idx[fi] + 1
        n = k - prev
        pad = S_max - n

        def pad_t(x):
            return np.pad(x, (0, pad), constant_values=times[k - 1])

        t = pad_t(times[prev:k])
        gB = np.stack([np.pad(s.gyro[prev:k], ((0, pad), (0, 0)))
                       for s in seqs])
        aB = np.stack([np.pad(s.acc[prev:k], ((0, pad), (0, 0)))
                       for s in seqs])
        valid = np.arange(S_max) < n
        return ImuBatch(
            jnp.asarray(np.tile(t, (B, 1)), dtype), jnp.asarray(gB, dtype),
            jnp.asarray(aB, dtype), jnp.asarray(np.tile(valid, (B, 1)))), k

    states = batched_init(frames_at(0),
                          np.full(B, float(times[idx[0]])), np.arange(B))
    prev = idx[0] + 1
    positions = []
    for fi in range(1, F):
        b, prev = batch_for(fi, prev)
        states, out = batched_step(states, jax.device_put(b), frames_at(fi))
        positions.append(out.position)

    est = np.asarray(jnp.stack(positions))  # (F-1, B, 3)
    ates = []
    for b_ in range(B):
        lane = est[:, b_, :]
        if not np.isfinite(lane).all():
            continue
        gt = seqs[b_].pos[idx[1:F]] - seqs[b_].pos[0]
        ates.append(float(ate_rmse(lane, gt)))
    ates.sort()
    return {
        "lanes": B,
        "frames_per_lane": F - 1,
        "finite_lanes": len(ates),
        "ate_rmse_m_median": round(float(np.median(ates)), 4) if ates else None,
        "ate_rmse_m_p90": (round(float(np.percentile(ates, 90)), 4)
                           if ates else None),
    }


def run_textured_long_staged(extra, run_stage, phase=1):
    """The long textured protocol (VERDICT round-2 item 1) as budget-gated
    stages. Phase 1 (high priority): stereo (the comparability anchor),
    vislam (the flagship full-system config), mono, fisheye. Phase 2 (after
    seed_diverse): the API-path stereo run. Phase 3 (lowest): multi-seed
    mono. Each leg records into extra["textured_long"] as soon as it
    finishes so a watchdog emission carries everything completed so far.
    Leg estimates are round-5 measured wall times + margin. Durations
    env-tunable: BENCH_LONG_DURATION (default 60 s), BENCH_VISLAM_DURATION
    (default same).
    """
    from hybvio_tpu.eval.long_probe import run_long_probe

    dur = float(os.environ.get("BENCH_LONG_DURATION", "60"))
    vdur = float(os.environ.get("BENCH_VISLAM_DURATION", str(dur)))
    out = extra["textured_long"]

    def leg(fam, key=None, **kw):
        out[key or fam] = run_long_probe(fam, **kw)

    if phase == 1:
        run_stage("long_stereo", 150,
                  lambda: leg("stereo", duration=dur))
        # vislam ATE is directly comparable to the stereo entry (same
        # trajectory, same world, SLAM off) = the SLAM-on-vs-off evidence;
        # steady-state FPS and finish() teardown reported separately
        run_stage("long_vislam", 90,
                  lambda: leg("vislam", duration=vdur))
        run_stage("long_mono", 85, lambda: leg("mono", duration=dur))
        run_stage("long_fisheye", 155, lambda: leg("fisheye", duration=dur))
        return
    if phase == 2:
        # the SAME stereo run through the full VioApi + native sample sync:
        # the host/API layer gets benchmark-scale accuracy evidence next to
        # the jitted-loop number (VERDICT r3 item 5). Cheap when it runs
        # after the vislam leg: the jitted stereo step is the same in-process
        # program, so this leg pays no compile.
        run_stage("long_stereo_api", 95,
                  lambda: leg("stereo_api", duration=dur))
        return

    # mono single-seed ATE is decision-cascade chaotic (measured spread
    # 0.06-0.17 across seeds in both covariance forms); carry a multi-seed
    # median so the mono accuracy number is a statistic, not one draw.
    # Seeds run one at a time, each budget-gated, so a partially full tail
    # still widens the statistic by however many seeds fit.
    seeds = [int(s) for s in
             os.environ.get("BENCH_MONO_SEEDS", "9,10").split(",") if s]
    base = out.get("mono", {}).get("ate_rmse_m")
    ates = [base] if base is not None else []
    ran = [8] if base is not None else []
    for s in seeds:
        def one_seed(s=s):
            ates.append(run_long_probe("mono", duration=dur,
                                       seed=s)["ate_rmse_m"])
            ran.append(s)
        run_stage("long_mono_seed%d" % s, 65, one_seed)
    vals = [a for a in ates if a is not None]
    if len(vals) > 1:
        out["mono_multiseed"] = {
            "seeds": ran, "ates": ates,
            "median": round(float(np.median(vals)), 4)}


def run_vislam(p, seq, render, F, jnp):
    """Full VISLAM (-useSlam; BASELINE config 3): the complete VioApi stack —
    sample sync, jitted stereo VIO step, async SLAM backend (keyframes, BoW
    loop closure, BA) on its worker thread — measured end to end in wall
    clock, with the SLAM-corrected output poses scored against ground truth."""
    import jax

    from hybvio_tpu.api.vio import VioApi
    from hybvio_tpu.eval.ate import ate_rmse

    W = int(2 * p.tracker.principalPointX)
    H = int(2 * p.tracker.principalPointY)
    api = VioApi(p, W, H, dtype=jnp.float32)
    outputs = []
    api.on_output = outputs.append

    # pre-render frames on device (measure the pipeline, not the renderer;
    # the host renderer costs ~240 ms/frame at this resolution)
    render_dev = build_device_renderer("vislam")

    def dev_frame(fi):
        k = seq.frame_sample_idx[fi]
        out = render_dev(seq.landmarks, seq.pos[k], seq.quat[k])
        return (out[0], out[1])

    frames = [dev_frame(fi) for fi in range(F)]

    frame_set = {int(k): fi for fi, k in enumerate(seq.frame_sample_idx[:F])}
    # warm up compile with the first two frames before timing
    t0 = None
    n_fed = 0
    for k in range(int(seq.frame_sample_idx[F - 1]) + 1):
        api.add_gyro(seq.times[k], seq.gyro[k])
        api.add_acc(seq.times[k], seq.acc[k])
        fi = frame_set.get(k)
        if fi is not None:
            fr = frames[fi]
            if isinstance(fr, tuple):
                api.add_frame_stereo(seq.times[k], fr[0], fr[1])
            else:
                api.add_frame_mono(seq.times[k], fr)
            n_fed += 1
            if n_fed == 2 and t0 is None:
                t0 = time.perf_counter()  # after compile of the first steps
    # steady-state FPS excludes the finish() teardown (end-of-run global
    # pose graph + BA sweeps) — reported separately so the number stays
    # comparable to the other configs' steady-state FPS
    t_end = time.perf_counter()
    api.finish()
    teardown_s = time.perf_counter() - t_end
    elapsed = t_end - (t0 or t_end)
    fps = max(n_fed - 2, 1) / max(elapsed, 1e-9)

    est = np.stack([np.asarray(o.position) for o in outputs])
    est_t = np.array([o.t for o in outputs])
    gt = np.stack([np.interp(est_t, seq.times, seq.pos[:, i] - seq.pos[0, i])
                   for i in range(3)], axis=1)
    ate = ate_rmse(est, gt) if np.isfinite(est).all() else float("nan")
    import jax as _jax

    result = {
        "metric": "synthetic_vislam_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s (single sequence, -useSlam)",
        "vs_baseline": round(fps / 200.0, 4),
        "extra": {
            "frames": n_fed,
            "outputs": len(outputs),
            "ate_rmse_m": None if not np.isfinite(ate) else round(float(ate), 4),
            "teardown_s": round(teardown_s, 2),
            "slam_keyframes": len(api.slam.slam.kf_order) if api.slam else 0,
            "loop_events": len(api.slam.slam.loop_events) if api.slam else 0,
            "dropped_candidates": api.slam.dropped if api.slam else 0,
            "backend": _jax.default_backend(),
        },
    }
    RESULT.update(result)
    if os.environ.get("BENCH_TEXTURED", "1") != "0":
        from hybvio_tpu.eval.textured_probe import run_textured_probe

        result["extra"]["textured_world"] = run_textured_probe(
            duration=6.0, stereo=True)
    emit(tag="vislam")


if __name__ == "__main__":
    main()
