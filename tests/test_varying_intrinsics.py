"""Per-frame varying intrinsics (zooming / autofocus lens).

Reference behavior: addFrameMonoVarying ingests per-frame camera intrinsics
(src/api/internal.hpp:216-230) and the JSONL reader feeds every frame's
cameraParameters through it (src/commandline/input_jsonl.cpp:119-199). The
TPU-native design carries (fx, fy, cx, cy, dist) as DYNAMIC arrays into the
one jitted step (geometry/cameras.with_intrinsics), so a lens change does not
retrace or recompile.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from hybvio_tpu.eval.ate import ate_rmse
from hybvio_tpu.geometry.cameras import (build_pinhole, pixel_to_ray,
                                         with_intrinsics)


def test_with_intrinsics_same_pytree_structure():
    import jax

    cam = build_pinhole(300.0, 300.0, 160.0, 120.0, coeffs=(0.01, -0.002),
                        width=320, height=240)
    cam2 = with_intrinsics(cam, 330.0, 331.0, 161.0, 119.0,
                           coeffs=(0.02, -0.001))
    assert (jax.tree_util.tree_structure(cam)
            == jax.tree_util.tree_structure(cam2))
    assert float(cam2.fx) == 330.0 and float(cam2.fy) == 331.0
    assert float(cam2.coeffs[0]) == pytest.approx(0.02)
    # distortion-free base: coeffs are ignored (flag is static)
    cam3 = build_pinhole(300.0, 300.0, 160.0, 120.0, width=320, height=240)
    cam4 = with_intrinsics(cam3, 400.0, coeffs=(0.5,))
    assert not cam4.has_distortion
    assert (jax.tree_util.tree_structure(cam3)
            == jax.tree_util.tree_structure(cam4))


def test_dynamic_camera_no_retrace():
    """A jitted function over the Camera pytree compiles ONCE across lens
    states (the whole point of dynamic intrinsics on TPU)."""
    import jax
    import jax.numpy as jnp

    traces = []

    @jax.jit
    def unproject(cam, px):
        traces.append(1)
        ray, ok = pixel_to_ray(cam, px)
        return ray

    cam = build_pinhole(300.0, 300.0, 160.0, 120.0, coeffs=(0.01,),
                        width=320, height=240)
    px = jnp.asarray([[100.0, 80.0], [200.0, 150.0]])
    r1 = unproject(cam, px)
    r2 = unproject(with_intrinsics(cam, 360.0, 360.0, 158.0, 121.0), px)
    assert len(traces) == 1  # one trace, two lens states
    assert not np.allclose(np.asarray(r1), np.asarray(r2))


def _run_zoom_api(zoom_frac, use_varying, duration=8.0, seed=3):
    """Drive VioApi on a blob world whose lens zooms fx0 -> fx0*(1+zoom).

    use_varying=True feeds the true per-frame intrinsics through
    add_frame_mono_varying; False feeds plain add_frame_mono (the session
    camera stays at the t=0 lens — the failure mode this feature removes).
    """
    import jax.numpy as jnp

    from hybvio_tpu.api.vio import VioApi
    from hybvio_tpu.config import Parameters
    from hybvio_tpu.io.synthetic import (SYNTH_IMU_TO_CAMERA,
                                         generate_sequence, render_view)

    W, H, FX = 320, 240, 260.0
    p = Parameters()
    p.tracker.focalLength = FX
    p.tracker.principalPointX = W / 2
    p.tracker.principalPointY = H / 2
    p.tracker.maxTracks = 48
    p.odometry.cameraTrailLength = 8
    p.tracker.gfttMinDistance = 25.0
    p.odometry.visualR = 0.3
    p.odometry.imuToCameraMatrix = tuple(
        np.asarray(SYNTH_IMU_TO_CAMERA).T.flatten())
    p.odometry.batchVisualUpdate = True

    seq = generate_sequence(duration=duration, imu_rate=100.0, frame_rate=10.0,
                            n_landmarks=300, gyro_noise=5e-4, acc_noise=5e-3,
                            seed=seed)
    n_frames = len(seq.frame_sample_idx)

    api = VioApi(p, W, H, dtype=jnp.float32)
    outputs = []
    api.on_output = outputs.append

    frame_at = {int(k): fi for fi, k in enumerate(seq.frame_sample_idx)}
    for k in range(len(seq.times)):
        t = float(seq.times[k])
        api.add_gyro(t, seq.gyro[k])
        api.add_acc(t, seq.acc[k])
        fi = frame_at.get(k)
        if fi is None:
            continue
        fx = FX * (1.0 + zoom_frac * fi / max(n_frames - 1, 1))
        img = render_view(seq.landmarks, seq.pos[k], seq.quat[k],
                          SYNTH_IMU_TO_CAMERA, fx, fx, W / 2, H / 2, W, H,
                          blob_sigma=1.2)
        if use_varying:
            api.add_frame_mono_varying(t, img, {
                "focalLengthX": fx, "focalLengthY": fx,
                "principalPointX": W / 2, "principalPointY": H / 2})
        else:
            api.add_frame_mono(t, img)
    api.finish()

    est = np.stack([np.asarray(o.position) for o in outputs])
    est_t = np.array([o.t for o in outputs])
    gt = np.stack([np.interp(est_t, seq.times, seq.pos[:, i] - seq.pos[0, i])
                   for i in range(3)], axis=1)
    finite = bool(np.isfinite(est).all())
    return (float(ate_rmse(est, gt)) if finite else float("inf")), finite


@pytest.mark.slow
def test_zooming_lens_tracks_with_varying_intrinsics():
    """A 30% zoom over 8 s: feeding the true per-frame lens keeps the
    trajectory accurate; baking the t=0 lens does measurably worse."""
    ate_varying, finite = _run_zoom_api(0.30, use_varying=True)
    assert finite
    ate_fixed, _ = _run_zoom_api(0.30, use_varying=False)
    # the true-lens run must be accurate in absolute terms (radius-2 m orbit)
    assert ate_varying < 0.25, (ate_varying, ate_fixed)
    # and clearly better than mis-modeling the zoom with the t=0 camera
    assert ate_varying < 0.7 * ate_fixed, (ate_varying, ate_fixed)


@pytest.mark.slow
def test_cli_consumes_per_frame_jsonl_intrinsics(tmp_path):
    """End-to-end: a JSONL dataset whose cameraParameters zoom per frame runs
    through the CLI (reference parity: input_jsonl.cpp:119-199)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_synthetic_dataset import make_dataset

    data_dir = str(tmp_path / "zoomset")
    make_dataset(data_dir, duration=5.0, world="blobs", zoom=0.25,
                 n_landmarks=300)
    out_path = str(tmp_path / "out.jsonl")
    # HYBVIO_PLATFORM (not JAX_PLATFORMS): the ambient sitecustomize
    # re-forces the remote-TPU platform via jax.config, which env vars do
    # not survive — with JAX_PLATFORMS alone the subprocess can hang on a
    # busy TPU tunnel (see tests/test_euroc_cli.py)
    env = dict(os.environ, JAX_PLATFORMS="cpu", HYBVIO_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "hybvio_tpu.cli.main",
         f"-i={data_dir}", f"-o={out_path}"],
        capture_output=True, text=True, timeout=900,
        env=env, cwd=os.path.join(os.path.dirname(__file__), ".."))
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(l) for l in open(out_path) if l.strip()]
    assert len(lines) > 20
    pos = np.array([[l["position"]["x"], l["position"]["y"],
                     l["position"]["z"]] for l in lines])
    assert np.isfinite(pos).all()
    # the zooming-lens trajectory must stay bounded (orbit radius 2 m)
    hist = {}
    for l in open(os.path.join(data_dir, "data.jsonl")):
        j = json.loads(l)
        if "groundTruth" in j:
            p = j["groundTruth"]["position"]
            hist[round(j["time"], 6)] = (p["x"], p["y"], p["z"])
    gt_t = np.array(sorted(hist))
    gt_p = np.array([hist[t] for t in sorted(hist)])
    gt_p -= gt_p[0]
    est_t = np.array([l["time"] for l in lines])
    gt = np.stack([np.interp(est_t, gt_t, gt_p[:, i]) for i in range(3)],
                  axis=1)
    ate = ate_rmse(pos, gt)
    assert ate < 0.35, ate
