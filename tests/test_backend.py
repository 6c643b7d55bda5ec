"""End-to-end backend tests on synthetic data with a perfect tracker.

Validates the full estimator chain (IMU scan -> trail bookkeeping -> budgeted
visual updates -> augmentation) without the image front-end, mirroring how the
reference isolates SampleSync/EKF from the vision stack in tests.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybvio_tpu.config import Parameters, DerivedParameters
from hybvio_tpu.geometry.cameras import build_pinhole
from hybvio_tpu.geometry.quaternion import quat_to_rmat
from hybvio_tpu.odometry.backend import (
    ImuBatch, TrackerInput, make_backend, STATUS_TRACKING,
)
from hybvio_tpu.io.synthetic import (
    SYNTH_IMU_TO_CAMERA, PerfectTracker, generate_sequence,
)
from hybvio_tpu.eval.ate import ate_rmse
from hybvio_tpu.ekf import POS, VEL, make_predict, init_state, initialize_orientation

WIDTH, HEIGHT = 640, 480
FX = FY = 400.0


def make_setup(trail=8, max_tracks=24, duration=6.0, pixel_noise=0.0,
               gyro_noise=0.0, acc_noise=0.0, seed=0, max_vu=8, frame_rate=15.0,
               imu_rate=150.0):
    p = Parameters()
    p.odometry.cameraTrailLength = trail
    p.tracker.maxTracks = max_tracks
    p.odometry.maxVisualUpdates = max_vu
    p.odometry.maxSuccessfulVisualUpdates = 5
    p.tracker.focalLength = FX
    p.tracker.principalPointX = WIDTH / 2
    p.tracker.principalPointY = HEIGHT / 2
    p.odometry.imuToCameraMatrix = tuple(SYNTH_IMU_TO_CAMERA.T.flatten())
    derived = DerivedParameters.from_parameters(p)
    cam = build_pinhole(FX, FY, WIDTH / 2, HEIGHT / 2, width=WIDTH, height=HEIGHT)
    seq = generate_sequence(
        duration=duration, imu_rate=imu_rate, frame_rate=frame_rate,
        gyro_noise=gyro_noise, acc_noise=acc_noise, seed=seed)
    tracker = PerfectTracker(
        seq, SYNTH_IMU_TO_CAMERA, cam, WIDTH, HEIGHT,
        max_tracks=max_tracks, pixel_noise=pixel_noise, seed=seed)
    return p, derived, cam, seq, tracker


def test_imu_conventions_dead_reckoning():
    """The synthetic IMU must dead-reckon to the ground-truth trajectory under
    the EKF's own predict — validates generator & filter conventions match."""
    p, derived, cam, seq, _ = make_setup(duration=3.0)
    po = p.odometry
    s = init_state(po)
    s = initialize_orientation(s, jnp.asarray(seq.acc[0]), po.noiseInitialOri, po.noiseScale**2)
    predict = jax.jit(make_predict(po))
    n = len(seq.times) // 2
    for k in range(n):
        s = predict(s, seq.times[k], jnp.asarray(seq.gyro[k]), jnp.asarray(seq.acc[k]))
    pos_err = np.linalg.norm(np.asarray(s.m[POS:POS + 3]) - (seq.pos[n - 1] - seq.pos[0]))
    # pure integration drifts, but over 1.5s it should be small
    assert pos_err < 0.05, pos_err
    vel_err = np.linalg.norm(np.asarray(s.m[VEL:VEL + 3]) - seq.vel[n - 1])
    assert vel_err < 0.05, vel_err


def run_vio(p, derived, cam, seq, tracker, n_frames=None, jit=True):
    init_fn, frame_step = make_backend(p, derived, (cam,), max_tracks=tracker.T)
    if jit:
        frame_step = jax.jit(frame_step)
    state = init_fn()
    F = len(seq.frame_sample_idx) if n_frames is None else n_frames
    prev = 0
    S_max = int(np.max(np.diff(np.concatenate([[0], seq.frame_sample_idx + 1]))))
    outs = []
    for fi in range(F):
        k = seq.frame_sample_idx[fi] + 1
        sl = slice(prev, k)
        n = k - prev
        pad = S_max - n
        t = np.pad(seq.times[sl], (0, pad), constant_values=seq.times[k - 1])
        g = np.pad(seq.gyro[sl], ((0, pad), (0, 0)))
        a = np.pad(seq.acc[sl], ((0, pad), (0, 0)))
        valid = np.arange(S_max) < n
        prev = k
        ids, pixels, keyframe = tracker.track(fi)
        batch = ImuBatch(jnp.asarray(t), jnp.asarray(g), jnp.asarray(a), jnp.asarray(valid))
        tin = TrackerInput(
            track_ids=jnp.asarray(ids), pixels=jnp.asarray(pixels),
            keyframe=jnp.asarray(bool(keyframe)),
            stereo_depth=jnp.full((tracker.T,), -1.0))
        state, out = frame_step(state, batch, tin)
        tracker.delete_tracks(np.asarray(state.blacklist_flags), np.asarray(state.blacklist_ids))
        outs.append(out)
    return state, outs


@pytest.mark.slow
def test_vio_end_to_end_accuracy():
    """Full VIO on a 6 s synthetic circle: estimated trajectory must be much
    better than IMU dead reckoning and reach TRACKING status."""
    p, derived, cam, seq, tracker = make_setup(
        duration=6.0, pixel_noise=0.2, gyro_noise=1e-3, acc_noise=1e-2,
        max_vu=20, max_tracks=40)
    state, outs = run_vio(p, derived, cam, seq, tracker)

    est = np.stack([np.asarray(o.position) for o in outs])
    gt = seq.pos[seq.frame_sample_idx[: len(outs)]] - seq.pos[0]
    ate = ate_rmse(est, gt)
    assert np.isfinite(est).all()
    assert ate < 0.05, ate

    # filter should reach TRACKING
    assert int(outs[-1].tracking_status) == STATUS_TRACKING

    # velocity should track ground truth reasonably
    v_est = np.asarray(outs[-1].velocity)
    v_gt = seq.vel[seq.frame_sample_idx[len(outs) - 1]]
    assert np.linalg.norm(v_est - v_gt) < 0.3

    # covariance stays finite & PSD-ish
    P = np.asarray(state.ekf.P)
    assert np.isfinite(P).all()
    eig = np.linalg.eigvalsh(0.5 * (P + P.T))
    assert eig.min() > -1e-6 * max(eig.max(), 1.0)


def test_vio_short_smoke():
    """Short smoke run: everything finite, point cloud populated."""
    p, derived, cam, seq, tracker = make_setup(duration=2.0, max_vu=6)
    state, outs = run_vio(p, derived, cam, seq, tracker, n_frames=12)
    for o in outs:
        assert np.isfinite(np.asarray(o.position)).all()
    # some triangulated points should appear once tracks mature
    statuses = np.concatenate([np.asarray(o.point_cloud_status) for o in outs[6:]])
    assert (statuses == 1).sum() > 0  # PF_POSE_TRAIL
