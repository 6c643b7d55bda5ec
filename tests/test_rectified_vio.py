"""Stereo VIO with useRectification: tracker runs on rectified images with
rotation-carrying pinhole cameras (reference: tracker.useRectification,
Image::Factory::buildStereo, image.cpp:310-338)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybvio_tpu.config import Parameters, DerivedParameters
from hybvio_tpu.geometry.cameras import build_pinhole
from hybvio_tpu.odometry.backend import ImuBatch
from hybvio_tpu.odometry.vio import make_vio
from hybvio_tpu.io.synthetic import SYNTH_IMU_TO_CAMERA, generate_sequence, render_view
from hybvio_tpu.eval.ate import ate_rmse

W, H = 320, 240
FX = FY = 260.0
SECOND_I2C = SYNTH_IMU_TO_CAMERA.copy()
SECOND_I2C[0, 3] = -0.11


def render_pair(seq, fi):
    k = seq.frame_sample_idx[fi]
    left = render_view(seq.landmarks, seq.pos[k], seq.quat[k],
                       SYNTH_IMU_TO_CAMERA, FX, FY, W / 2, H / 2, W, H, blob_sigma=1.2)
    right = render_view(seq.landmarks, seq.pos[k], seq.quat[k],
                        SECOND_I2C, FX, FY, W / 2, H / 2, W, H, blob_sigma=1.2)
    return left, right


@pytest.mark.slow
def test_stereo_vio_rectified():
    p = Parameters()
    p.odometry.cameraTrailLength = 8
    p.tracker.maxTracks = 48
    p.tracker.useStereo = True
    p.tracker.useRectification = True
    p.tracker.focalLength = FX
    p.tracker.principalPointX = W / 2
    p.tracker.principalPointY = H / 2
    p.tracker.pyrLKWindowSize = 15
    p.tracker.pyrLKMaxLevel = 2
    p.tracker.gfttMinDistance = 25.0
    p.odometry.imuToCameraMatrix = tuple(SYNTH_IMU_TO_CAMERA.T.flatten())
    p.odometry.secondImuToCameraMatrix = tuple(SECOND_I2C.T.flatten())
    p.odometry.visualR = 0.3
    derived = DerivedParameters.from_parameters(p)
    cam = build_pinhole(FX, FY, W / 2, H / 2, width=W, height=H)

    seq = generate_sequence(duration=4.0, imu_rate=100.0, frame_rate=10.0,
                            n_landmarks=300, gyro_noise=5e-4, acc_noise=5e-3, seed=4)

    init_fn, vio_step = make_vio(p, derived, (cam, cam), max_tracks=48)
    vio_step = jax.jit(vio_step)

    F = len(seq.frame_sample_idx)
    S_max = int(np.max(np.diff(np.concatenate([[0], seq.frame_sample_idx + 1]))))
    l0, r0 = render_pair(seq, 0)
    state = init_fn(jnp.asarray(l0), t0=float(seq.frame_times[0]),
                    second_image=jnp.asarray(r0))
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
        li, ri = render_pair(seq, fi)
        batch = ImuBatch(jnp.asarray(t), jnp.asarray(g), jnp.asarray(a), jnp.asarray(valid))
        state, out = vio_step(state, batch, jnp.asarray(li), jnp.asarray(ri))
        outs.append(out)

    est = np.stack([np.asarray(o.position) for o in outs])
    assert np.isfinite(est).all()
    gt = seq.pos[seq.frame_sample_idx[1:F]] - seq.pos[0]
    ate = ate_rmse(est, gt)
    assert ate < 0.15, ate
