"""Hybrid EKF-SLAM map points (odometry.hybridMapSize > 0): long-lived
features promoted into the EKF state and updated directly
(reference: ekf.cpp:905-926, backend.cpp:1076-1168)."""
import jax
import jax.numpy as jnp
import numpy as np

from tests.test_backend import make_setup, run_vio
from hybvio_tpu.eval.ate import ate_rmse


def test_hybrid_map_promotion_and_accuracy():
    p, derived, cam, seq, tracker = make_setup(
        duration=5.0, pixel_noise=0.3, gyro_noise=1e-3, acc_noise=1e-2,
        max_vu=20, max_tracks=40, trail=8, frame_rate=10.0, imu_rate=100.0)
    p.odometry.hybridMapSize = 8
    p.odometry.visualR = 0.3
    state, outs = run_vio(p, derived, cam, seq, tracker)

    est = np.stack([np.asarray(o.position) for o in outs])
    assert np.isfinite(est).all()
    gt = seq.pos[seq.frame_sample_idx[:len(outs)]] - seq.pos[0]
    ate = ate_rmse(est, gt)
    assert ate < 0.08, ate

    # map slots must get populated
    mp_ids = np.asarray(state.trail.map_point_ids)
    assert (mp_ids >= 0).sum() > 0, mp_ids

    # hybrid updates must appear in the point cloud statuses (PF_HYBRID = 2)
    statuses = np.concatenate([np.asarray(o.point_cloud_status) for o in outs])
    assert (statuses == 2).sum() > 0

    # state dimension includes the map block
    d = state.ekf.m.shape[0]
    assert d == 20 + 7 * 8 + 3 * 8
    # map point values should be near real landmarks (sanity, loose)
    m = np.asarray(state.ekf.m)
    pts = m[20 + 7 * 8:].reshape(8, 3)
    live = mp_ids >= 0
    if live.any():
        d_land = np.linalg.norm(
            pts[live][:, None, :] - (seq.landmarks - seq.pos[0])[None, :, :], axis=-1).min(axis=1)
        assert np.median(d_land) < 1.0, d_land


def test_hybrid_map_batched_visual_update():
    """batchVisualUpdate with hybridMapSize > 0: promotions claim slots via
    the vectorized insert and hybrid tracks update through the stacked H."""
    p, derived, cam, seq, tracker = make_setup(
        duration=5.0, pixel_noise=0.3, gyro_noise=1e-3, acc_noise=1e-2,
        max_vu=20, max_tracks=40, trail=8, frame_rate=10.0, imu_rate=100.0)
    p.odometry.hybridMapSize = 8
    p.odometry.visualR = 0.3
    p.odometry.batchVisualUpdate = True
    state, outs = run_vio(p, derived, cam, seq, tracker)

    est = np.stack([np.asarray(o.position) for o in outs])
    assert np.isfinite(est).all()
    gt = seq.pos[seq.frame_sample_idx[:len(outs)]] - seq.pos[0]
    ate = ate_rmse(est, gt)
    assert ate < 0.1, ate

    mp_ids = np.asarray(state.trail.map_point_ids)
    assert (mp_ids >= 0).sum() > 0, mp_ids
    statuses = np.concatenate([np.asarray(o.point_cloud_status) for o in outs])
    assert (statuses == 2).sum() > 0
    # promoted blocks must hold sane landmark estimates
    m = np.asarray(state.ekf.m)
    pts = m[20 + 7 * 8:].reshape(8, 3)
    live = mp_ids >= 0
    if live.any():
        d_land = np.linalg.norm(
            pts[live][:, None, :] - (seq.landmarks - seq.pos[0])[None, :, :],
            axis=-1).min(axis=1)
        assert np.median(d_land) < 1.5, d_land
