"""EKF tests, mirroring the reference test strategy (reference: test/ekf.cpp):
chi2 golden value, predict Jacobian vs numeric differencing (jax.jacfwd),
transformTo round trip, plus augmentation/undo semantics and ZUPT behavior.
"""
import jax
import jax.numpy as jnp
import numpy as np

from hybvio_tpu.config import Parameters
from hybvio_tpu import ekf
from hybvio_tpu.ekf import (
    EKFState, init_state, make_predict, predict_mean_and_jacobians,
    update_zupt, update_zrupt, update_pseudo_velocity, visual_track_update,
    augment_pose, undo_augmentation, initialize_orientation, transform_to,
    translate_to, condition_on_last_pose, lock_biases, CHI2INV95,
    POS, VEL, ORI, BGA, CAM, INER_DIM, POSE_DIM,
)


def params(trail=5, hybrid=0):
    p = Parameters()
    p.odometry.cameraTrailLength = trail
    p.odometry.hybridMapSize = hybrid
    return p


def rand_state(po, seed=0, init_trail=True):
    rng = np.random.RandomState(seed)
    s = init_state(po)
    m = np.asarray(s.m).copy()
    m[POS:POS + 3] = rng.randn(3)
    m[VEL:VEL + 3] = rng.randn(3) * 0.3
    q = rng.randn(4)
    m[ORI:ORI + 4] = q / np.linalg.norm(q)
    if init_trail:
        for i in range(po.cameraTrailLength):
            off = CAM + POSE_DIM * i
            m[off:off + 3] = rng.randn(3)
            q = rng.randn(4)
            m[off + 3:off + 7] = q / np.linalg.norm(q)
    # random PSD covariance
    d = m.size
    A = rng.randn(d, d) * 0.1
    P = A @ A.T + np.eye(d) * 1e-3
    return s._replace(m=jnp.asarray(m), P=jnp.asarray(P))


def test_chi2_table():
    # golden values from the reference table (src/odometry/util.hpp:23)
    np.testing.assert_allclose(CHI2INV95[1], 3.841458820694124, rtol=1e-12)
    np.testing.assert_allclose(CHI2INV95[20], 31.41043284423091, rtol=1e-12)
    assert CHI2INV95[0] == 0.0


def test_init_state_layout():
    po = params().odometry
    s = init_state(po)
    d = INER_DIM + 7 * po.cameraTrailLength
    assert s.m.shape == (d,)
    assert s.P.shape == (d, d)
    assert float(s.m[ORI]) == 1.0
    np.testing.assert_allclose(np.asarray(s.m[16:19]), 1.0)  # BAT
    ns = po.noiseScale**2
    np.testing.assert_allclose(float(s.P[0, 0]), po.noiseInitialPos**2 * ns)
    np.testing.assert_allclose(float(s.P[CAM, CAM]), po.noiseInitialPosTrail**2 * ns)


def test_initialize_orientation():
    po = params().odometry
    s = init_state(po)
    xa = jnp.asarray([0.3, -0.2, 9.7])
    s = initialize_orientation(s, xa, po.noiseInitialOri, po.noiseScale**2)
    # gravity (0,0,-g) in world should map to -xa direction in IMU frame:
    # R(q) rotates -gravity onto xa (FromTwoVectors semantics)
    from hybvio_tpu.geometry import quat_to_rmat
    R = quat_to_rmat(s.m[ORI:ORI + 4])
    got = np.asarray(R @ jnp.asarray([0.0, 0.0, 1.0]))
    expected = np.asarray(xa / jnp.linalg.norm(xa))
    np.testing.assert_allclose(got, expected, atol=1e-9)
    # heading variance zero
    assert float(s.P[ORI + 3, ORI + 3]) == 0.0


def test_predict_jacobian_vs_numeric():
    """Port of reference test/ekf.cpp "der_predict": analytic dydx vs numeric
    differencing of the predict mean, tolerance 1e-3."""
    po = params(trail=5).odometry
    s = rand_state(po, seed=1)
    dt = 0.01
    gyro = jnp.asarray([0.188914, -0.313109, -0.032521])
    acc = jnp.asarray([0.182453, 7.46259, 2.25091])

    m_new, dydx, dydq = predict_mean_and_jacobians(po, s.m, dt, gyro, acc)

    def mean_fn(x_iner):
        mm = s.m.at[:INER_DIM].set(x_iner)
        out, _, _ = predict_mean_and_jacobians(po, mm, dt, gyro, acc)
        return out[:INER_DIM]

    J = jax.jacfwd(mean_fn)(s.m[:INER_DIM])
    D = np.asarray(J - dydx)
    assert np.abs(D).max() < 1e-3, np.abs(D).max()


def test_predict_straight_line_mean():
    """Dead-reckoning sanity: stationary IMU (only gravity) keeps pos/vel ~ 0."""
    po = params(trail=3).odometry
    s = init_state(po)
    xa = jnp.asarray([0.0, 0.0, po.gravity])
    xg = jnp.zeros(3)
    s = initialize_orientation(s, xa, po.noiseInitialOri, po.noiseScale**2)
    predict = jax.jit(make_predict(po))
    t = 0.0
    for _ in range(100):
        t += 0.005
        s = predict(s, t, xg, xa)
    np.testing.assert_allclose(np.asarray(s.m[POS:POS + 3]), 0.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(s.m[VEL:VEL + 3]), 0.0, atol=1e-9)
    # covariance grows and stays symmetric-ish
    P = np.asarray(s.P)
    assert np.abs(P - P.T).max() < 1e-8
    assert float(s.time) > 0.49


def test_predict_skips_nonpositive_dt():
    po = params(trail=2).odometry
    s = init_state(po)
    predict = make_predict(po)
    s = predict(s, 1.0, jnp.zeros(3), jnp.asarray([0.0, 0.0, 9.819]))
    m1 = np.asarray(s.m)
    s2 = predict(s, 0.5, jnp.zeros(3), jnp.asarray([0.0, 0.0, 9.819]))
    np.testing.assert_allclose(np.asarray(s2.m), m1)


def test_zupt():
    po = params(trail=2).odometry
    s = rand_state(po, seed=2)
    s = s._replace(time=jnp.asarray(1.0))
    ns = po.noiseScale**2
    s2 = update_zupt(s, 1e-6, ns)
    # velocity strongly pulled toward zero (gain limited by the synthetic prior)
    v_before = np.linalg.norm(np.asarray(s.m[VEL:VEL + 3]))
    assert np.linalg.norm(np.asarray(s2.m[VEL:VEL + 3])) < 0.1 * v_before
    assert bool(s2.was_stationary)
    # rate limiting: second call within 0.25s is a no-op
    s3 = update_zupt(s2._replace(time=jnp.asarray(1.1)), 1e-6, ns)
    np.testing.assert_allclose(np.asarray(s3.m), np.asarray(s2.m))


def test_zrupt_sets_gyro_bias():
    po = params(trail=2).odometry
    s = rand_state(po, seed=3)
    s = s._replace(time=jnp.asarray(1.0))
    xg = jnp.asarray([0.01, -0.02, 0.03])
    s2 = update_zrupt(s, xg, 1e-8, po.noiseScale**2)
    np.testing.assert_allclose(np.asarray(s2.m[BGA:BGA + 3]), np.asarray(xg), atol=1e-3)


def test_pseudo_velocity_reduces_speed():
    po = params(trail=2).odometry
    s = rand_state(po, seed=4)
    m = np.asarray(s.m).copy()
    m[VEL:VEL + 2] = [3.0, 4.0]
    s = s._replace(m=jnp.asarray(m))
    s2 = update_pseudo_velocity(s, 1.0, 1e-4, po.noiseScale**2)
    h = np.linalg.norm(np.asarray(s2.m[VEL:VEL + 2]))
    assert h < 5.0 and h > 0.5


def test_transform_to_round_trip():
    """Port of reference test/ekf.cpp "tranformTo"."""
    po = params(trail=5).odometry
    s = rand_state(po, seed=5)
    anchor = 2
    off = CAM + POSE_DIM * anchor
    pos0 = np.asarray(s.m[off:off + 3]).copy()
    rot0 = np.asarray(s.m[off + 3:off + 7]).copy()
    m0, P0 = np.asarray(s.m).copy(), np.asarray(s.P).copy()

    to_pos = jnp.asarray([0.0, 1.0, 0.0])
    to_rot = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    s = transform_to(s, to_pos, to_rot, po.cameraTrailLength, anchor)
    np.testing.assert_allclose(np.asarray(s.m[off:off + 3]), np.asarray(to_pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.m[off + 3:off + 7]), np.asarray(to_rot), atol=1e-6)

    s = transform_to(s, jnp.asarray(pos0), jnp.asarray(rot0), po.cameraTrailLength, anchor)
    assert np.linalg.norm(np.asarray(s.m) - m0) < 1e-3
    assert np.linalg.norm(np.asarray(s.P) - P0) < 1e-3


def test_translate_to():
    po = params(trail=3).odometry
    s = rand_state(po, seed=6)
    target = jnp.asarray([1.0, 2.0, 3.0])
    delta = np.asarray(target) - np.asarray(s.m[POS:POS + 3])
    trail0 = np.asarray(s.m[CAM:CAM + 3]).copy()
    s2 = translate_to(s, target, po.cameraTrailLength)
    np.testing.assert_allclose(np.asarray(s2.m[POS:POS + 3]), np.asarray(target), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s2.m[CAM:CAM + 3]), trail0 + delta, atol=1e-12)


def test_augmentation_clones_pose_and_drops():
    po = params(trail=4).odometry
    s = rand_state(po, seed=7)
    s = s._replace(first_sample_t=jnp.asarray(10.0), time=jnp.asarray(2.0))
    trail_before = [np.asarray(s.m[CAM + 7 * i:CAM + 7 * (i + 1)]).copy() for i in range(4)]
    cur = np.concatenate([np.asarray(s.m[POS:POS + 3]), np.asarray(s.m[ORI:ORI + 4])])

    # drop the last pose (default case)
    s2 = augment_pose(s, po.cameraTrailLength - 1, po)
    # head slot == current pose (clone enforced by the tight update)
    np.testing.assert_allclose(np.asarray(s2.m[CAM:CAM + 7]), cur, atol=1e-5)
    # old slots shifted by one; the last dropped
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(s2.m[CAM + 7 * (i + 1):CAM + 7 * (i + 2)]), trail_before[i], atol=1e-5)
    assert int(s2.augment_count) == 1
    np.testing.assert_allclose(float(s2.pose_times[0]), 12.0)

    # drop pose index 1: slots 2,3 keep their previous values
    s3 = augment_pose(s, 1, po)
    np.testing.assert_allclose(np.asarray(s3.m[CAM:CAM + 7]), cur, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s3.m[CAM + 7:CAM + 14]), trail_before[0], atol=1e-5)
    # distant slots move only marginally (KF update couples through P)
    np.testing.assert_allclose(np.asarray(s3.m[CAM + 14:CAM + 21]), trail_before[2], atol=1e-4)
    np.testing.assert_allclose(np.asarray(s3.m[CAM + 21:CAM + 28]), trail_before[3], atol=1e-4)


def test_augment_then_undo_restores_trail():
    po = params(trail=4).odometry
    s = rand_state(po, seed=8)
    trail_before = np.asarray(s.m[CAM:]).copy()
    s2 = augment_pose(s, po.cameraTrailLength - 1, po)
    s3 = undo_augmentation(s2, po.cameraTrailLength, po.hybridMapSize)
    # all but the dropped last slot restored
    np.testing.assert_allclose(np.asarray(s3.m[CAM:CAM + 7 * 3]), trail_before[:21], atol=1e-5)
    # last slot zeroed
    np.testing.assert_allclose(np.asarray(s3.m[CAM + 21:CAM + 28]), 0.0, atol=1e-12)
    assert int(s3.augment_count) == 0


def test_augmentation_covariance_psd():
    po = params(trail=4).odometry
    s = rand_state(po, seed=9)
    s2 = augment_pose(s, 3, po)
    eig = np.linalg.eigvalsh(np.asarray(s2.P))
    assert eig.min() > -1e-6 * eig.max()


def test_visual_update_masked_rows_noop():
    """A zero-masked row must not change the result at all."""
    po = params(trail=3).odometry
    s = rand_state(po, seed=10)
    d = s.m.shape[0]
    rng = np.random.RandomState(11)
    n = 8
    H = rng.randn(n, d) * 0.1
    f = rng.randn(n) * 0.01
    y = f + rng.randn(n) * 0.001

    mask_full = jnp.ones(n, dtype=bool)
    r1 = visual_track_update(s.m, s.P, jnp.asarray(H), jnp.asarray(f), jnp.asarray(y),
                             mask_full, 0.05, po.noiseScale**2, 1.5, -1.0)

    # same measurement padded with 4 junk rows, masked out
    n2 = n + 4
    H2 = np.zeros((n2, d)); H2[:n] = H
    f2 = np.zeros(n2); f2[:n] = f
    y2 = np.concatenate([y, rng.randn(4)])
    mask2 = jnp.asarray([True] * n + [False] * 4)
    r2 = visual_track_update(s.m, s.P, jnp.asarray(H2), jnp.asarray(f2), jnp.asarray(y2),
                             mask2, 0.05, po.noiseScale**2, 1.5, -1.0)
    assert bool(r1.is_inlier) == bool(r2.is_inlier)
    np.testing.assert_allclose(np.asarray(r2.m), np.asarray(r1.m), atol=1e-9)
    np.testing.assert_allclose(np.asarray(r2.P), np.asarray(r1.P), atol=1e-9)
    np.testing.assert_allclose(float(r2.chi2_value), float(r1.chi2_value), rtol=1e-9)


def test_visual_update_chi2_gate_rejects_large_residual():
    po = params(trail=3).odometry
    s = rand_state(po, seed=12)
    d = s.m.shape[0]
    rng = np.random.RandomState(13)
    n = 6
    H = jnp.asarray(rng.randn(n, d) * 0.01)
    f = jnp.zeros(n)
    y = jnp.asarray(rng.randn(n) * 100.0)  # absurd residual
    r = visual_track_update(s.m, s.P, H, f, y, jnp.ones(n, dtype=bool),
                            0.05, po.noiseScale**2, 1.5, -1.0)
    assert not bool(r.is_inlier)
    np.testing.assert_allclose(np.asarray(r.m), np.asarray(s.m))  # unchanged


def test_condition_and_lock():
    po = params(trail=3).odometry
    s = rand_state(po, seed=14)
    s2 = condition_on_last_pose(s, po.cameraTrailLength)
    d = s.m.shape[0]
    assert np.allclose(np.asarray(s2.P[:d - 7, d - 7:]), 0.0)
    s3 = lock_biases(s)
    assert np.allclose(np.asarray(s3.P[BGA:BGA + 9, :]), 0.0)
