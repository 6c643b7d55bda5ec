"""Full-pipeline VIO test: rendered synthetic frames + IMU -> trajectory.

This is the complete system (image front-end + estimator) on data where
ground truth is known; the image-free estimator path is covered by
test_backend.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybvio_tpu.config import Parameters, DerivedParameters
from hybvio_tpu.geometry.cameras import build_pinhole
from hybvio_tpu.odometry.backend import ImuBatch
from hybvio_tpu.odometry.vio import make_vio
from hybvio_tpu.io.synthetic import (
    SYNTH_IMU_TO_CAMERA, generate_sequence, render_view,
)
from hybvio_tpu.eval.ate import ate_rmse

W, H = 320, 240
FX = FY = 260.0


def build(duration=6.0, trail=8, max_tracks=48, seed=0):
    p = Parameters()
    p.odometry.cameraTrailLength = trail
    p.tracker.maxTracks = max_tracks
    p.tracker.focalLength = FX
    p.tracker.principalPointX = W / 2
    p.tracker.principalPointY = H / 2
    p.tracker.pyrLKWindowSize = 15
    p.tracker.pyrLKMaxLevel = 2
    p.tracker.gfttMinDistance = 25.0
    p.odometry.imuToCameraMatrix = tuple(SYNTH_IMU_TO_CAMERA.T.flatten())
    p.odometry.visualR = 0.3  # matched to this front-end's LK noise on the
    # synthetic renders (dataset-specific tuning, as the reference does via
    # parameters.txt per benchmark dataset)
    derived = DerivedParameters.from_parameters(p)
    cam = build_pinhole(FX, FY, W / 2, H / 2, width=W, height=H)
    seq = generate_sequence(
        duration=duration, imu_rate=100.0, frame_rate=10.0,
        n_landmarks=300, gyro_noise=5e-4, acc_noise=5e-3, seed=seed)
    return p, derived, cam, seq


def render(seq, fi):
    k = seq.frame_sample_idx[fi]
    return render_view(seq.landmarks, seq.pos[k], seq.quat[k],
                       SYNTH_IMU_TO_CAMERA, FX, FY, W / 2, H / 2, W, H,
                       blob_sigma=1.2)


@pytest.mark.slow
def test_full_vio_on_rendered_frames():
    p, derived, cam, seq = build(duration=6.0)
    init_fn, vio_step = make_vio(p, derived, (cam,), max_tracks=48)
    vio_step = jax.jit(vio_step)

    F = len(seq.frame_sample_idx)
    S_max = int(np.max(np.diff(np.concatenate([[0], seq.frame_sample_idx + 1]))))

    state = init_fn(jnp.asarray(render(seq, 0)), t0=float(seq.frame_times[0]))
    prev = seq.frame_sample_idx[0] + 1
    outs = []
    for fi in range(1, F):
        k = seq.frame_sample_idx[fi] + 1
        n = k - prev
        pad = S_max - n
        t = np.pad(seq.times[prev:k], (0, pad), constant_values=seq.times[k - 1])
        g = np.pad(seq.gyro[prev:k], ((0, pad), (0, 0)))
        a = np.pad(seq.acc[prev:k], ((0, pad), (0, 0)))
        valid = np.arange(S_max) < n
        prev = k
        batch = ImuBatch(jnp.asarray(t), jnp.asarray(g), jnp.asarray(a), jnp.asarray(valid))
        state, out = vio_step(state, batch, jnp.asarray(render(seq, fi)))
        outs.append(out)

    est = np.stack([np.asarray(o.position) for o in outs])
    assert np.isfinite(est).all()
    gt = seq.pos[seq.frame_sample_idx[1:F]] - seq.pos[0]
    ate = ate_rmse(est, gt)
    # image-based tracking is noisier than the perfect tracker; the filter
    # must still stay well under dead-reckoning drift (meters over 6 s)
    assert ate < 0.15, ate
