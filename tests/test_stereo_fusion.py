"""Stereo pre-triangulation fusion (reference: useIndependentStereoTriangulation
-> Triangulator::triangulateStereo, triangulation.cpp:137-138,409-608): unit
accuracy of the information-weighted idp fusion, comparison against the
stacked-rows GN under noise, and an end-to-end stereo run with the flag on."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybvio_tpu.config import DerivedParameters, Parameters
from hybvio_tpu.eval.ate import ate_rmse
from hybvio_tpu.geometry.cameras import build_pinhole
from hybvio_tpu.io.synthetic import (
    SYNTH_IMU_TO_CAMERA, PerfectTracker, generate_sequence)
from hybvio_tpu.odometry.backend import ImuBatch, TrackerInput, make_backend
from hybvio_tpu.odometry.triangulation import (
    TRI_OK, CameraPoses, inverse_depth, triangulate_gn,
    triangulate_stereo_fused, triangulate_stereo_idp)

BASELINE = 0.11


def _scene(n_poses=5, noise=0.0, seed=0):
    """n_poses left cameras looking at a point; returns (poses, per-pose
    stereo idp+cov from noisy normalized observations, true point)."""
    rng = np.random.RandomState(seed)
    pt_w = np.array([0.4, 0.3, 5.0])
    s2f = np.eye(4)
    s2f[0, 3] = BASELINE  # right camera at -x in left coords => shift +x back

    ps, Rs, idps, covs, oks = [], [], [], [], []
    for i in range(n_poses):
        # camera at spread positions, identity-ish orientation
        p = np.array([0.35 * i - 0.7, 0.05 * i, 0.0])
        th = 0.04 * (i - 2)
        c, s = np.cos(th), np.sin(th)
        R = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])  # world->cam
        pc_l = R @ (pt_w - p)
        pc_r = pc_l - np.array([BASELINE, 0.0, 0.0])  # right cam origin at +baseline x
        ip_l = pc_l[:2] / pc_l[2] + noise * rng.randn(2)
        ip_r = pc_r[:2] / pc_r[2] + noise * rng.randn(2)
        idp, cov, ok = triangulate_stereo_idp(
            jnp.asarray(ip_l), jnp.asarray(ip_r), jnp.asarray(s2f))
        ps.append(p); Rs.append(R)
        idps.append(np.asarray(idp)); covs.append(np.asarray(cov))
        oks.append(bool(ok))
    poses = CameraPoses(p=jnp.asarray(np.stack(ps)), R=jnp.asarray(np.stack(Rs)))
    return poses, jnp.asarray(np.stack(idps)), jnp.asarray(np.stack(covs)), \
        jnp.asarray(np.array(oks)), pt_w, s2f


def test_fused_recovers_point_noiseless():
    poses, idps, covs, oks, pt_w, _ = _scene(noise=0.0)
    res = triangulate_stereo_fused(poses, idps, covs, oks)
    assert int(res.status) == TRI_OK
    np.testing.assert_allclose(np.asarray(res.pf), pt_w, atol=1e-6)


def test_fused_respects_validity_mask():
    poses, idps, covs, oks, pt_w, _ = _scene(noise=0.0)
    # poison pose 3's idp but mark it invalid: result must be unaffected
    idps = idps.at[3].set(jnp.asarray([5.0, -3.0, 0.01]))
    mask = oks.at[3].set(False)
    res = triangulate_stereo_fused(poses, idps, covs, mask)
    assert int(res.status) == TRI_OK
    np.testing.assert_allclose(np.asarray(res.pf), pt_w, atol=1e-6)


def test_fused_vs_stacked_gn_under_noise():
    """The fusion must land in the same accuracy family as the stacked
    left+right GN on noisy stereo tracks (VERDICT round-1 item 5)."""
    errs_fused, errs_gn = [], []
    for seed in range(8):
        poses, idps, covs, oks, pt_w, s2f = _scene(noise=2e-3, seed=seed)
        res = triangulate_stereo_fused(poses, idps, covs, oks)
        assert int(res.status) == TRI_OK
        errs_fused.append(np.linalg.norm(np.asarray(res.pf) - pt_w))

        # stacked GN over the same noisy observations: rebuild the 2N-camera
        # trail (left rows then right rows) and per-camera normalized points
        N = poses.p.shape[0]
        rng = np.random.RandomState(seed)
        ips = []
        pr, Rr = [], []
        for i in range(N):
            R = np.asarray(poses.R[i]); p = np.asarray(poses.p[i])
            pc_l = R @ (pt_w - p)
            pc_r = pc_l - np.array([BASELINE, 0, 0])
            ips.append(pc_l[:2] / pc_l[2] + 2e-3 * rng.randn(2))
            pr.append(p); Rr.append(R)
        for i in range(N):
            R = np.asarray(poses.R[i]); p = np.asarray(poses.p[i])
            pc_r = R @ (pt_w - p) - np.array([BASELINE, 0, 0])
            ips.append(pc_r[:2] / pc_r[2] + 2e-3 * rng.randn(2))
            # right camera pose: origin shifted along left cam x
            pr.append(p + R.T @ np.array([BASELINE, 0, 0])); Rr.append(R)
        trail = CameraPoses(p=jnp.asarray(np.stack(pr)), R=jnp.asarray(np.stack(Rr)))
        tri = triangulate_gn(trail, jnp.asarray(np.stack(ips)),
                             jnp.ones(2 * N, bool), stereo=True)
        assert int(tri.status) == TRI_OK
        errs_gn.append(np.linalg.norm(np.asarray(tri.pf) - pt_w))

    med_f, med_g = np.median(errs_fused), np.median(errs_gn)
    # same family: within 3x of each other (they weight noise differently)
    assert med_f < 3 * med_g + 1e-3, (med_f, med_g)
    assert med_f < 0.2, med_f  # and absolutely accurate at this noise level


def test_fused_is_differentiable_wrt_poses():
    poses, idps, covs, oks, pt_w, _ = _scene(noise=1e-3)

    def pf_of_p(p_flat):
        po = CameraPoses(p=p_flat.reshape(-1, 3), R=poses.R)
        return triangulate_stereo_fused(po, idps, covs, oks).pf

    J = jax.jacfwd(pf_of_p)(poses.p.reshape(-1))
    assert np.isfinite(np.asarray(J)).all()
    # numeric cross-check on a few entries
    eps = 1e-6
    p0 = np.asarray(poses.p.reshape(-1))
    f0 = np.asarray(pf_of_p(jnp.asarray(p0)))
    for j in [0, 4, 8]:
        pp = p0.copy(); pp[j] += eps
        fd = (np.asarray(pf_of_p(jnp.asarray(pp))) - f0) / eps
        np.testing.assert_allclose(np.asarray(J)[:, j], fd, atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_stereo_vio_with_independent_triangulation():
    """End-to-end stereo backend with useIndependentStereoTriangulation on:
    accuracy in the same family as the stacked-GN stereo run
    (tests/test_stereo_backend.py asserts <0.06 on the same setup)."""
    W, H = 640, 480
    FX = FY = 400.0
    SECOND = SYNTH_IMU_TO_CAMERA.copy()
    SECOND[0, 3] = -BASELINE

    p = Parameters()
    p.odometry.cameraTrailLength = 8
    p.tracker.maxTracks = 40
    p.tracker.useStereo = True
    p.odometry.maxVisualUpdates = 20
    p.odometry.useIndependentStereoTriangulation = True
    p.tracker.focalLength = FX
    p.tracker.principalPointX = W / 2
    p.tracker.principalPointY = H / 2
    p.odometry.imuToCameraMatrix = tuple(SYNTH_IMU_TO_CAMERA.T.flatten())
    p.odometry.secondImuToCameraMatrix = tuple(SECOND.T.flatten())
    p.odometry.visualR = 0.3
    derived = DerivedParameters.from_parameters(p)
    cam = build_pinhole(FX, FY, W / 2, H / 2, width=W, height=H)
    seq = generate_sequence(duration=5.0, imu_rate=100.0, frame_rate=10.0,
                            gyro_noise=1e-3, acc_noise=1e-2, seed=3)
    tracker = PerfectTracker(seq, SYNTH_IMU_TO_CAMERA, cam, W, H,
                             max_tracks=40, pixel_noise=0.3, seed=3,
                             second_imu_to_camera=SECOND)

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
    assert ate < 0.10, ate
    # scale observable without alignment too
    ate_noscale = ate_rmse(est, gt, with_scale=False)
    assert ate_noscale < 0.20, ate_noscale
