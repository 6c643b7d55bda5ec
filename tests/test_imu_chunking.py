"""High-rate IMU must not be truncated: 800 Hz IMU at 10 FPS yields 80
samples/frame, more than the default 64-wide ImuBatch. The API must chunk
the pending samples through IMU-only propagation steps (reference processes
EVERY synced sample, control.cpp:79-155) rather than dropping the oldest.
"""
import numpy as np
import pytest

from hybvio_tpu.config import Parameters
from hybvio_tpu.io.synthetic import (
    SYNTH_IMU_TO_CAMERA, generate_sequence, render_view,
)

W, H = 160, 120
FX = FY = 130.0


def _params(max_tracks=24):
    p = Parameters()
    p.odometry.cameraTrailLength = 6
    p.tracker.maxTracks = max_tracks
    p.tracker.focalLength = FX
    p.tracker.principalPointX = W / 2
    p.tracker.principalPointY = H / 2
    p.tracker.pyrLKWindowSize = 11
    p.tracker.pyrLKMaxLevel = 1
    p.tracker.gfttMinDistance = 18.0
    p.odometry.imuToCameraMatrix = tuple(SYNTH_IMU_TO_CAMERA.T.flatten())
    p.odometry.visualR = 0.3
    return p


def _run(seq, max_imu_per_frame, n_frames):
    from hybvio_tpu.api.vio import VioApi

    api = VioApi(_params(), W, H, max_imu_per_frame=max_imu_per_frame)
    outputs = []
    api.on_output = outputs.append
    fi = 0
    frame_set = set(seq.frame_sample_idx[:n_frames].tolist())
    for k in range(seq.frame_sample_idx[n_frames - 1] + 1):
        api.add_gyro(seq.times[k], seq.gyro[k])
        api.add_acc(seq.times[k], seq.acc[k])
        if k in frame_set:
            img = render_view(seq.landmarks, seq.pos[k], seq.quat[k],
                              SYNTH_IMU_TO_CAMERA, FX, FY, W / 2, H / 2,
                              W, H, blob_sigma=1.2)
            api.add_frame_mono(seq.times[k], img)
            fi += 1
    return outputs


@pytest.mark.slow
def test_800hz_imu_not_truncated():
    # 800 Hz IMU, 10 FPS -> 80 samples/frame (> default S=64)
    seq = generate_sequence(duration=2.0, imu_rate=800.0, frame_rate=10.0,
                            n_landmarks=200, seed=3)
    n_frames = 12
    out_chunked = _run(seq, max_imu_per_frame=64, n_frames=n_frames)
    out_wide = _run(seq, max_imu_per_frame=96, n_frames=n_frames)

    assert len(out_chunked) == len(out_wide) > 0
    pos_c = np.stack([o.position for o in out_chunked])
    pos_w = np.stack([o.position for o in out_wide])
    assert np.isfinite(pos_c).all()
    # identical sample streams, identical per-sample EKF op sequence — only
    # the chunk boundaries differ, so trajectories must agree tightly
    assert np.max(np.abs(pos_c - pos_w)) < 1e-6, np.max(np.abs(pos_c - pos_w))

    vel_c = np.stack([o.velocity for o in out_chunked])
    vel_w = np.stack([o.velocity for o in out_wide])
    assert np.max(np.abs(vel_c - vel_w)) < 1e-6
