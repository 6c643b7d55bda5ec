"""float32 (TPU deployment dtype) vs float64 estimator consistency.

The TPU path runs the whole filter in f32 with targeted
jax.lax.Precision.HIGHEST matmuls in the EKF covariance algebra
(ekf/update.py pdot, predict/augment). This test proves the f32 filter stays
healthy: same setup run at both precisions must produce trajectories that are
(a) individually accurate and (b) close to each other.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybvio_tpu.eval.ate import ate_rmse
from hybvio_tpu.odometry.backend import ImuBatch, TrackerInput, make_backend

from test_backend import make_setup


def run_at_dtype(p, derived, cam, seq, tracker, dtype, n_frames):
    init_fn, frame_step = make_backend(
        p, derived, (cam,), max_tracks=tracker.T, dtype=dtype)
    frame_step = jax.jit(frame_step)
    state = init_fn()
    prev = 0
    S_max = int(np.max(np.diff(np.concatenate([[0], seq.frame_sample_idx + 1]))))
    tracker.reset()
    est = []
    for fi in range(n_frames):
        k = seq.frame_sample_idx[fi] + 1
        n = k - prev
        pad = S_max - n
        t = np.pad(seq.times[prev:k], (0, pad), constant_values=seq.times[k - 1])
        g = np.pad(seq.gyro[prev:k], ((0, pad), (0, 0)))
        a = np.pad(seq.acc[prev:k], ((0, pad), (0, 0)))
        valid = np.arange(S_max) < n
        prev = k
        ids, pixels, keyframe = tracker.track(fi)
        batch = ImuBatch(jnp.asarray(t, dtype), jnp.asarray(g, dtype),
                         jnp.asarray(a, dtype), jnp.asarray(valid))
        tin = TrackerInput(
            track_ids=jnp.asarray(ids),
            pixels=jnp.asarray(pixels, dtype),
            keyframe=jnp.asarray(bool(keyframe)),
            stereo_depth=jnp.full((tracker.T,), -1.0, dtype))
        state, out = frame_step(state, batch, tin)
        tracker.delete_tracks(np.asarray(state.blacklist_flags),
                              np.asarray(state.blacklist_ids))
        est.append(np.asarray(out.position, np.float64))
    P = np.asarray(state.ekf.P, np.float64)
    return np.stack(est), P


@pytest.mark.slow
def test_f32_matches_f64():
    p, derived, cam, seq, tracker = make_setup(
        duration=6.0, pixel_noise=0.2, gyro_noise=1e-3, acc_noise=1e-2,
        max_vu=20, max_tracks=40)
    F = len(seq.frame_sample_idx)
    est64, P64 = run_at_dtype(p, derived, cam, seq, tracker, jnp.float64, F)
    est32, P32 = run_at_dtype(p, derived, cam, seq, tracker, jnp.float32, F)

    gt = seq.pos[seq.frame_sample_idx[:F]] - seq.pos[0]
    ate64 = ate_rmse(est64, gt)
    ate32 = ate_rmse(est32, gt)
    assert np.isfinite(est32).all()
    assert ate64 < 0.06, ate64
    # f32 must stay accurate in its own right (not just close to f64: chaotic
    # sensitivity makes trajectory-level divergence grow with time)
    assert ate32 < 0.10, ate32

    # covariances finite + PSD at both precisions
    for P in (P64, P32):
        assert np.isfinite(P).all()
        eig = np.linalg.eigvalsh(0.5 * (P + P.T))
        assert eig.min() > -1e-5 * max(eig.max(), 1.0)

    # trajectories should be in the same basin: discrete decisions (chi2
    # gates, outlier blacklisting, keyframe drops) can flip between
    # precisions and amplify, so only a coarse agreement bound is meaningful
    diff = np.linalg.norm(est64 - est32, axis=1)
    assert np.median(diff) < 0.15, np.median(diff)
