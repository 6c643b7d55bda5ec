"""Stereo backend test: perfect stereo tracker -> stacked left+right visual
updates (reference stereo mode: features from both cameras in one track
update, triangulation over 2n rays)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybvio_tpu.config import Parameters, DerivedParameters
from hybvio_tpu.geometry.cameras import build_pinhole
from hybvio_tpu.odometry.backend import ImuBatch, TrackerInput, make_backend
from hybvio_tpu.io.synthetic import SYNTH_IMU_TO_CAMERA, PerfectTracker, generate_sequence
from hybvio_tpu.eval.ate import ate_rmse

W, H = 640, 480
FX = FY = 400.0

SECOND_I2C = SYNTH_IMU_TO_CAMERA.copy()
SECOND_I2C[0, 3] = -0.11  # 11 cm baseline along camera x


def test_stereo_vio_accuracy():
    p = Parameters()
    p.odometry.cameraTrailLength = 8
    p.tracker.maxTracks = 40
    p.tracker.useStereo = True
    p.odometry.maxVisualUpdates = 20
    p.tracker.focalLength = FX
    p.tracker.principalPointX = W / 2
    p.tracker.principalPointY = H / 2
    p.odometry.imuToCameraMatrix = tuple(SYNTH_IMU_TO_CAMERA.T.flatten())
    p.odometry.secondImuToCameraMatrix = tuple(SECOND_I2C.T.flatten())
    p.odometry.visualR = 0.3
    derived = DerivedParameters.from_parameters(p)
    np.testing.assert_allclose(derived.second_imu_to_camera, SECOND_I2C)

    cam = build_pinhole(FX, FY, W / 2, H / 2, width=W, height=H)
    seq = generate_sequence(duration=5.0, imu_rate=100.0, frame_rate=10.0,
                            pixel_noise=0.0 if False else 0.0,
                            gyro_noise=1e-3, acc_noise=1e-2, seed=3) if False else \
        generate_sequence(duration=5.0, imu_rate=100.0, frame_rate=10.0,
                          gyro_noise=1e-3, acc_noise=1e-2, seed=3)
    tracker = PerfectTracker(seq, SYNTH_IMU_TO_CAMERA, cam, W, H,
                             max_tracks=40, pixel_noise=0.3, seed=3,
                             second_imu_to_camera=SECOND_I2C)

    init_fn, frame_step = make_backend(p, derived, (cam, cam), max_tracks=40)
    frame_step = jax.jit(frame_step)
    state = init_fn()

    F = len(seq.frame_sample_idx)
    S_max = int(np.max(np.diff(np.concatenate([[0], seq.frame_sample_idx + 1]))))
    prev = 0
    outs = []
    for fi in range(F):
        k = seq.frame_sample_idx[fi] + 1
        n = k - prev
        pad = S_max - n
        t = np.pad(seq.times[prev:k], (0, pad), constant_values=seq.times[k - 1])
        g = np.pad(seq.gyro[prev:k], ((0, pad), (0, 0)))
        a = np.pad(seq.acc[prev:k], ((0, pad), (0, 0)))
        valid = np.arange(S_max) < n
        prev = k
        ids, pixels, keyframe = tracker.track(fi)
        assert pixels.shape[1] == 2  # stereo
        batch = ImuBatch(jnp.asarray(t), jnp.asarray(g), jnp.asarray(a), jnp.asarray(valid))
        tin = TrackerInput(jnp.asarray(ids), jnp.asarray(pixels),
                           jnp.asarray(bool(keyframe)), jnp.full((40,), -1.0))
        state, out = frame_step(state, batch, tin)
        tracker.delete_tracks(np.asarray(state.blacklist_flags), np.asarray(state.blacklist_ids))
        outs.append(out)

    est = np.stack([np.asarray(o.position) for o in outs])
    assert np.isfinite(est).all()
    gt = seq.pos[seq.frame_sample_idx[:F]] - seq.pos[0]
    ate = ate_rmse(est, gt)
    assert ate < 0.06, ate

    # stereo makes scale observable: also check WITHOUT scale alignment
    ate_noscale = ate_rmse(est, gt, with_scale=False)
    assert ate_noscale < 0.08, ate_noscale
