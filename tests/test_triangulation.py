"""Triangulation + visual-update-preparation tests
(reference: test/triangulation.cpp strategy: synthetic pose trails, derivative
checks of the full measurement model against numeric differencing)."""
import jax
import jax.numpy as jnp
import numpy as np

from hybvio_tpu.config import Parameters
from hybvio_tpu.geometry.quaternion import quat_normalize, quat_to_rmat
from hybvio_tpu.odometry.triangulation import (
    TRI_BEHIND, TRI_OK, CameraPoses, camera_poses_from_states, inverse_depth,
    triangulate_gn, triangulate_linear, triangulate_two_cameras,
    triangulate_stereo_idp,
)
from hybvio_tpu.odometry.visual_update import make_prepare_track_update
from hybvio_tpu.ekf.state import CAM, ORI, POS, POSE_DIM


I2C = np.diag([1.0, -1.0, -1.0, 1.0])  # default-ish imuToCamera


def synthetic_trail(n=6, seed=0, spread=1.0):
    """IMU pose states (n,7) looking at a target area along +z (camera)."""
    rng = np.random.RandomState(seed)
    states = np.zeros((n, 7))
    for i in range(n):
        states[i, :3] = np.array([i * spread / n, 0.05 * rng.randn(), 0.02 * rng.randn()])
        q = np.array([1.0, 0, 0, 0]) + 0.05 * rng.randn(4)
        states[i, 3:] = q / np.linalg.norm(q)
    return jnp.asarray(states)


def project(poses: CameraPoses, pf):
    pfc = np.einsum("nij,nj->ni", np.asarray(poses.R), np.asarray(pf)[None] - np.asarray(poses.p))
    return pfc[:, :2] / pfc[:, 2:3]


def test_two_camera_exact():
    states = synthetic_trail(2, seed=1)
    poses = camera_poses_from_states(states, jnp.asarray(I2C))
    pf_true = np.array([0.3, -0.2, -4.0])  # in front of camera (-z IMU = +z cam)
    ips = project(poses, pf_true)
    pf_c0 = triangulate_two_cameras(
        poses.p[0], poses.R[0], poses.p[1], poses.R[1],
        jnp.asarray(ips[0]), jnp.asarray(ips[1]))
    pf_world = np.asarray(poses.R[0]).T @ np.asarray(pf_c0) + np.asarray(poses.p[0])
    np.testing.assert_allclose(pf_world, pf_true, atol=1e-9)


def test_gn_triangulation_recovers_point():
    states = synthetic_trail(6, seed=2)
    poses = camera_poses_from_states(states, jnp.asarray(I2C))
    pf_true = np.array([0.4, 0.3, -5.0])
    ips = jnp.asarray(project(poses, pf_true))
    mask = jnp.ones(6, dtype=bool)
    res = triangulate_gn(poses, ips, mask)
    assert int(res.status) == TRI_OK
    np.testing.assert_allclose(np.asarray(res.pf), pf_true, atol=1e-6)


def test_gn_triangulation_mask_invariance():
    states = synthetic_trail(6, seed=3)
    poses = camera_poses_from_states(states, jnp.asarray(I2C))
    pf_true = np.array([-0.2, 0.1, -3.0])
    ips = np.asarray(project(poses, pf_true))

    res_full = triangulate_gn(poses, jnp.asarray(ips), jnp.ones(6, dtype=bool))

    # pad with 3 junk poses, masked out
    states_pad = jnp.concatenate([states, jnp.tile(states[:1], (3, 1))], axis=0)
    poses_pad = camera_poses_from_states(states_pad, jnp.asarray(I2C))
    ips_pad = np.concatenate([ips, 1000.0 * np.ones((3, 2))])
    mask = jnp.asarray([True] * 6 + [False] * 3)
    res_pad = triangulate_gn(poses_pad, jnp.asarray(ips_pad), mask)
    np.testing.assert_allclose(np.asarray(res_pad.pf), np.asarray(res_full.pf), atol=1e-9)
    assert int(res_pad.status) == int(res_full.status)


def test_gn_behind_camera():
    states = synthetic_trail(4, seed=4)
    poses = camera_poses_from_states(states, jnp.asarray(I2C))
    pf_true = np.array([0.0, 0.0, 6.0])  # behind cameras (IMU +z = cam -z)
    ips = project(poses, pf_true)
    res = triangulate_gn(poses, jnp.asarray(ips), jnp.ones(4, dtype=bool))
    assert int(res.status) in (TRI_BEHIND, 1, 2)


def test_linear_triangulation():
    states = synthetic_trail(5, seed=5)
    poses = camera_poses_from_states(states, jnp.asarray(I2C))
    pf_true = np.array([0.1, -0.4, -4.5])
    ips = jnp.asarray(project(poses, pf_true))
    res = triangulate_linear(poses, ips, jnp.ones(5, dtype=bool))
    assert int(res.status) == TRI_OK
    np.testing.assert_allclose(np.asarray(res.pf), pf_true, atol=1e-8)


def test_stereo_idp():
    # second camera 10cm to the right of first, same orientation
    s2f = np.eye(4)
    s2f[0, 3] = 0.1  # second-to-first: second origin at +0.1x in first coords
    pf = np.array([0.2, -0.1, 2.0])  # in first camera coords
    ip0 = pf[:2] / pf[2]
    pf_second = pf - s2f[:3, 3]
    ip1 = pf_second[:2] / pf_second[2]
    idp, cov, ok = triangulate_stereo_idp(jnp.asarray(ip0), jnp.asarray(ip1), jnp.asarray(s2f))
    assert bool(ok)
    expected_idp = np.array([pf[0] / pf[2], pf[1] / pf[2], 1.0 / pf[2]])
    np.testing.assert_allclose(np.asarray(idp), expected_idp, atol=1e-9)
    assert np.all(np.isfinite(np.asarray(cov)))


def test_inverse_depth_involution():
    v = jnp.asarray([0.3, -0.2, 2.5])
    np.testing.assert_allclose(np.asarray(inverse_depth(inverse_depth(v))), np.asarray(v), atol=1e-12)


# --- prepare_track_update ---

def _setup_prepare(n_poses=5, trail=8, seed=6, est_sft=False):
    p = Parameters()
    p.odometry.cameraTrailLength = trail
    p.odometry.estimateImuCameraTimeShift = est_sft
    po = p.odometry
    d = 20 + 7 * trail
    N = trail + 1

    prepare = make_prepare_track_update(po, I2C, I2C, use_stereo=False, d=d)

    states = synthetic_trail(n_poses, seed=seed, spread=1.5)
    pf_true = np.array([0.3, 0.2, -4.0])
    poses = camera_poses_from_states(states, jnp.asarray(I2C))
    ips_valid = project(poses, pf_true)

    pose_states = jnp.tile(states[:1], (N, 1)).at[:n_poses].set(states)
    trail_index = jnp.arange(N, dtype=jnp.int32)
    ips = jnp.zeros((N, 2)).at[:n_poses].set(jnp.asarray(ips_valid))
    vels = jnp.zeros((N, 2))
    mask = jnp.arange(N) < n_poses
    return po, d, N, prepare, pose_states, trail_index, ips, vels, mask, pf_true


def test_prepare_track_update_zero_residual():
    po, d, N, prepare, pose_states, trail_index, ips, vels, mask, pf_true = _setup_prepare()
    out = prepare(pose_states, trail_index, ips, vels, mask)
    assert int(out.tri_status) == TRI_OK
    assert int(out.prepare_status) == 0
    np.testing.assert_allclose(np.asarray(out.pf), pf_true, atol=1e-6)
    # perfect measurements: predicted == measured on valid rows
    r = np.asarray(out.f - out.y)[np.asarray(out.row_mask)]
    np.testing.assert_allclose(r, 0.0, atol=1e-6)
    assert out.H.shape == (2 * N, d)


def test_prepare_track_update_jacobian_vs_numeric():
    """The ported derivative check: H columns vs central differences of the
    measurement model over EKF pose-state entries
    (reference: test/triangulation.cpp derivativeTest)."""
    po, d, N, prepare, pose_states, trail_index, ips, vels, mask, _ = _setup_prepare()
    out = prepare(pose_states, trail_index, ips, vels, mask)
    H = np.asarray(out.H)

    eps = 1e-6
    from hybvio_tpu.odometry.visual_update import state_col_offsets
    # check derivative w.r.t. a few pose entries (current pose + 2 historical)
    for j, comp in [(0, 0), (0, 4), (2, 1), (2, 5), (4, 2)]:
        col_pos, col_ori = state_col_offsets(jnp.asarray(j))
        col = int(col_pos) + comp if comp < 3 else int(col_ori) + comp - 3
        dps = np.zeros((N, 7))
        dps[j, comp] = eps
        fp = prepare(pose_states + jnp.asarray(dps), trail_index, ips, vels, mask).f
        fm = prepare(pose_states - jnp.asarray(dps), trail_index, ips, vels, mask).f
        num = np.asarray(fp - fm) / (2 * eps)
        np.testing.assert_allclose(H[:, col], num, atol=1e-4, rtol=1e-3)


def test_prepare_track_update_hybrid_map_point():
    po, d0, N, _, pose_states, trail_index, ips, vels, mask, pf_true = _setup_prepare()
    # hybrid map slot lives AFTER the pose trail in the state vector
    d = d0 + 3
    prepare = make_prepare_track_update(po, I2C, I2C, use_stereo=False, d=d)
    off = jnp.asarray(d0, dtype=jnp.int32)
    out = prepare(pose_states, trail_index, ips, vels, mask,
                  map_point=jnp.asarray(pf_true), map_point_offset=off)
    assert int(out.tri_status) == 6  # HYBRID
    r = np.asarray(out.f - out.y)[np.asarray(out.row_mask)]
    np.testing.assert_allclose(r, 0.0, atol=1e-9)
    # map point columns: d proj / d pf
    eps = 1e-6
    Hm = np.asarray(out.H[:, d0:d0 + 3])
    for k in range(3):
        dp = np.zeros(3); dp[k] = eps
        fp = prepare(pose_states, trail_index, ips, vels, mask,
                     map_point=jnp.asarray(pf_true + dp), map_point_offset=off).f
        fm = prepare(pose_states, trail_index, ips, vels, mask,
                     map_point=jnp.asarray(pf_true - dp), map_point_offset=off).f
        num = np.asarray(fp - fm) / (2 * eps)
        np.testing.assert_allclose(Hm[:, k], num, atol=1e-5)


def test_end_to_end_visual_update_corrects_pose():
    """Integration: EKF with a consistent trail and a perturbed current pose;
    a few visual updates must pull the current position toward the truth."""
    from hybvio_tpu.ekf import init_state, visual_track_update

    trail = 6
    p = Parameters()
    p.odometry.cameraTrailLength = trail
    po = p.odometry
    d = 20 + 7 * trail
    N = trail + 1
    n_poses = 6

    prepare = make_prepare_track_update(po, I2C, I2C, use_stereo=False, d=d)
    states_true = np.asarray(synthetic_trail(n_poses, seed=7, spread=2.0))

    s = init_state(po)
    m = np.asarray(s.m).copy()
    # current pose = states_true[0], perturbed
    m[POS:POS + 3] = states_true[0, :3] + np.array([0.05, -0.03, 0.02])
    m[ORI:ORI + 4] = states_true[0, 3:]
    for i in range(1, n_poses):
        off = CAM + POSE_DIM * (i - 1)
        m[off:off + 3] = states_true[i, :3]
        m[off + 3:off + 7] = states_true[i, 3:]
    s = s._replace(m=jnp.asarray(m))
    # plausible covariance: current pos uncertain, trail tight
    P = np.asarray(s.P).copy()
    ns = po.noiseScale**2
    P[:3, :3] = np.eye(3) * 0.01 * ns
    for i in range(n_poses - 1):
        off = CAM + POSE_DIM * (i - 1 + 1)
        P[off:off + 7, off:off + 7] = np.eye(7) * 1e-6 * ns
    s = s._replace(P=jnp.asarray(P))

    rng = np.random.RandomState(8)
    err0 = np.linalg.norm(np.asarray(s.m[POS:POS + 3]) - states_true[0, :3])
    for k in range(6):
        pf_true = np.array([0.5 * rng.randn(), 0.5 * rng.randn(), -5.0 + rng.randn()])
        poses_true = camera_poses_from_states(jnp.asarray(states_true), jnp.asarray(I2C))
        ips_true = project(poses_true, pf_true)

        # gather pose states from the (perturbed) EKF like the backend would
        ps = np.zeros((N, 7))
        mm = np.asarray(s.m)
        ps[0, :3] = mm[POS:POS + 3]
        ps[0, 3:] = mm[ORI:ORI + 4]
        for i in range(1, N):
            off = CAM + POSE_DIM * (i - 1)
            ps[i, :3] = mm[off:off + 3]
            ps[i, 3:] = mm[off + 3:off + 7]
        ips = np.zeros((N, 2)); ips[:n_poses] = ips_true
        mask = jnp.arange(N) < n_poses

        out = prepare(jnp.asarray(ps), jnp.arange(N, dtype=jnp.int32),
                      jnp.asarray(ips), jnp.zeros((N, 2)), mask)
        res = visual_track_update(
            s.m, s.P, out.H, out.f, out.y, out.row_mask,
            0.01, ns, chi_outlier_r=-1.0, rmse_threshold=-1.0)
        s = s._replace(m=res.m, P=res.P)

    err1 = np.linalg.norm(np.asarray(s.m[POS:POS + 3]) - states_true[0, :3])
    assert err1 < 0.5 * err0, (err0, err1)


def test_solve3_spd_equil_accuracy():
    """Equilibrated explicit Cholesky matches LU on anisotropic SPD systems
    (the f32 mono small-baseline regime where unscaled LLT/Cramer fail)."""
    import numpy as np

    from hybvio_tpu.odometry.triangulation import _solve3_spd_equil

    rng = np.random.RandomState(0)
    for scale in (1.0, 1e3, 1e6):
        # SPD with wildly different diagonal scales
        L = np.tril(rng.rand(3, 3) + 0.5)
        A64 = (L @ L.T) * np.array([[1, 1, scale]]) * np.array([[1], [1], [scale]])
        b64 = rng.rand(3)
        x_ref = np.linalg.solve(A64, b64)
        x32 = np.asarray(_solve3_spd_equil(
            jnp.asarray(A64, jnp.float32), jnp.asarray(b64, jnp.float32),
            jnp.float32))
        np.testing.assert_allclose(x32, x_ref, rtol=2e-3)


def test_triangulate_gn_f32_rejects_tiny_baseline():
    """In f32, a near-zero-baseline trail must be rejected by the
    conditioning gate rather than produce a plausible-but-garbage depth
    (the failure mode behind mono ATE 0.005 -> 0.13 with a non-NaN solver)."""
    import numpy as np

    from hybvio_tpu.geometry.quaternion import quat_to_rmat
    from hybvio_tpu.odometry.triangulation import (
        TRI_OK, CameraPoses, triangulate_gn)

    K = 6
    # camera barely moves: 0.1 mm baseline, point 5 m away
    p = jnp.asarray(np.linspace(0, 1e-4, K)[:, None] * np.array([1.0, 0, 0]),
                    jnp.float32)
    R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3))
    pt = np.array([0.3, -0.2, 5.0])
    ips = jnp.asarray(
        (pt[:2] / pt[2])[None, :] + 1e-5 * np.random.RandomState(0).randn(K, 2),
        jnp.float32)
    res = triangulate_gn(CameraPoses(p=p, R=R), ips, jnp.ones((K,), bool),
                         rcond_threshold=1e-5)
    assert int(res.status) != TRI_OK
