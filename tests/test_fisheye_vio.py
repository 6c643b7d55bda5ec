"""Fisheye (Kannala-Brandt 4) full VIO test — the TUM-VI-style configuration
(BASELINE config 4): KB4 camera model end to end through the tracker + EKF."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybvio_tpu.config import Parameters, DerivedParameters
from hybvio_tpu.geometry.cameras import build_fisheye
from hybvio_tpu.odometry.backend import ImuBatch
from hybvio_tpu.odometry.vio import make_vio
from hybvio_tpu.io.synthetic import (
    SYNTH_IMU_TO_CAMERA, generate_sequence, render_view_fisheye,
)
from hybvio_tpu.eval.ate import ate_rmse

W, H = 256, 256
FX = FY = 95.0  # wide FOV fisheye
KB4 = (0.0035, 0.0007, -0.002, 0.0002)


@pytest.mark.slow
def test_fisheye_full_vio():
    p = Parameters()
    p.odometry.cameraTrailLength = 8
    p.tracker.maxTracks = 48
    p.tracker.fisheyeCamera = True
    p.tracker.validCameraFov = 150.0
    p.tracker.focalLength = FX
    p.tracker.principalPointX = W / 2
    p.tracker.principalPointY = H / 2
    p.tracker.distortionCoeffs = KB4
    p.tracker.pyrLKWindowSize = 13
    p.tracker.pyrLKMaxLevel = 2
    p.tracker.gfttMinDistance = 30.0
    p.odometry.imuToCameraMatrix = tuple(SYNTH_IMU_TO_CAMERA.T.flatten())
    p.odometry.visualR = 0.4
    derived = DerivedParameters.from_parameters(p)
    cam = build_fisheye(FX, FY, W / 2, H / 2, coeffs=KB4, max_valid_fov_deg=150.0,
                        width=W, height=H)

    seq = generate_sequence(duration=5.0, imu_rate=100.0, frame_rate=10.0,
                            n_landmarks=400, gyro_noise=5e-4, acc_noise=5e-3,
                            seed=2, landmark_radius=5.0)

    def render(fi):
        k = seq.frame_sample_idx[fi]
        return render_view_fisheye(
            seq.landmarks, seq.pos[k], seq.quat[k], SYNTH_IMU_TO_CAMERA,
            FX, FY, W / 2, H / 2, W, H, KB4, max_fov_deg=150.0, blob_sigma=1.2)

    init_fn, vio_step = make_vio(p, derived, (cam,), max_tracks=48)
    vio_step = jax.jit(vio_step)

    F = len(seq.frame_sample_idx)
    S_max = int(np.max(np.diff(np.concatenate([[0], seq.frame_sample_idx + 1]))))
    state = init_fn(jnp.asarray(render(0)), t0=float(seq.frame_times[0]))
    assert int(jnp.sum(state.tracker.track_ids >= 0)) > 8

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
        state, out = vio_step(state, batch, jnp.asarray(render(fi)))
        outs.append(out)

    est = np.stack([np.asarray(o.position) for o in outs])
    assert np.isfinite(est).all()
    gt = seq.pos[seq.frame_sample_idx[1:F]] - seq.pos[0]
    ate = ate_rmse(est, gt)
    assert ate < 0.2, ate
