"""SLAM module tests: keyframes, map points, local BA correction, ORB
descriptors / matching, loop closure detection."""
import jax.numpy as jnp
import numpy as np
import pytest

from hybvio_tpu.config import Parameters
from hybvio_tpu.slam.session import Slam, pose_to_mat, mat_to_pose
from hybvio_tpu.slam.orb import frame_signature, match_descriptors, orb_descriptors
from hybvio_tpu.io.synthetic import render_view, SYNTH_IMU_TO_CAMERA


def cam_pose_cw(pos, yaw):
    """Simple camera-to-world pose: camera at pos, looking along +x world."""
    c, s = np.cos(yaw), np.sin(yaw)
    # camera z (forward) -> world direction (c, s, 0); camera x -> (-s, c, 0)... build R cw
    # proper rotation: cam x=(-s,c,0), cam y=(0,0,1) (down = world +z here),
    # cam z (forward)=(c,s,0); columns are camera axes in world
    Rcw = np.array([
        [-s, 0.0, c],
        [c, 0.0, s],
        [0.0, 1.0, 0.0],
    ])
    T = np.eye(4)
    T[:3, :3] = Rcw
    T[:3, 3] = pos
    return T


def project_to_norm(T_cw, pts):
    R = T_cw[:3, :3]
    t = T_cw[:3, 3]
    pc = (pts - t) @ R  # world->cam
    z = pc[:, 2]
    ok = z > 0.3
    ip = pc[:, :2] / np.where(ok, z, 1.0)[:, None]
    return ip, ok


def test_slam_keyframes_and_map():
    p = Parameters()
    p.slam.keyframeDecisionMinIntervalSeconds = 0.0
    p.slam.keyframeDecisionDistanceThreshold = 0.01
    slam = Slam(p, max_ba_keyframes=8, compute_descriptors=False)
    rng = np.random.RandomState(0)
    landmarks = np.stack([
        4.0 + rng.rand(60) * 2, rng.randn(60) * 2, rng.randn(60) * 1], axis=1)

    for k in range(6):
        T = cam_pose_cw(np.array([0.0, k * 0.3, 0.0]), 0.0)
        ip, ok = project_to_norm(T, landmarks)
        ids = np.where(ok, np.arange(60), -1).astype(np.int32)
        res = slam.add_frame(None, T, ids[ok], ip[ok], t=float(k), frame_num=k)

    assert len(slam.kf_order) >= 4
    cloud = slam._cloud()
    assert len(cloud) > 20
    # triangulated points near ground truth
    errs = []
    for pid, tid, pos in cloud:
        errs.append(np.linalg.norm(pos - landmarks[tid]))
    assert np.median(errs) < 0.05, np.median(errs)


def test_slam_ba_corrects_noisy_odometry():
    p = Parameters()
    p.slam.keyframeDecisionMinIntervalSeconds = 0.0
    p.slam.keyframeDecisionDistanceThreshold = 0.01
    slam = Slam(p, max_ba_keyframes=10, compute_descriptors=False)
    rng = np.random.RandomState(1)
    landmarks = np.stack([
        4.0 + rng.rand(80) * 2, rng.randn(80) * 2.5, rng.randn(80)], axis=1)

    gt = []
    for k in range(8):
        pos = np.array([0.0, k * 0.25, 0.0])
        T_true = cam_pose_cw(pos, 0.0)
        gt.append(pos)
        # noisy odometry pose passed to SLAM
        T_odo = T_true.copy()
        T_odo[:3, 3] += rng.randn(3) * 0.01
        ip, ok = project_to_norm(T_true, landmarks)
        ip = ip + rng.randn(*ip.shape) * 5e-4
        ids = np.where(ok, np.arange(80), -1).astype(np.int32)
        res = slam.add_frame(None, T_odo, ids[ok], ip[ok], t=float(k), frame_num=k)

    # after BA, keyframe positions should be closer to truth than raw odometry
    errs_slam, errs_odo = [], []
    for i, kf_id in enumerate(slam.kf_order):
        kf = slam.keyframes[kf_id]
        errs_slam.append(np.linalg.norm(kf.pose[:3] - gt[i]))
        errs_odo.append(np.linalg.norm(kf.odo_pose[:3] - gt[i]))
    # anchored at first kf; compare mean errors
    assert np.mean(errs_slam) <= np.mean(errs_odo) + 1e-9


def test_orb_descriptors_match_same_image():
    img = render_view(
        np.array([[6.0, 0.0, 0.0], [6.0, 1.0, 0.3], [6.0, -1.0, -0.4]]),
        np.zeros(3), np.array([1.0, 0, 0, 0]), SYNTH_IMU_TO_CAMERA,
        260.0, 260.0, 160.0, 120.0, 320, 240)
    pts = jnp.asarray(np.array(
        [[160.0, 120.0], [60.0, 80.0], [240.0, 160.0], [100.0, 200.0]], np.float32))
    valid = jnp.ones(4, bool)
    d1, ok1 = orb_descriptors(jnp.asarray(img), pts, valid)
    # same image, slightly perturbed points: descriptors should match 1:1
    d2, ok2 = orb_descriptors(jnp.asarray(img), pts + 0.4, valid)
    midx, score = match_descriptors(d1, ok1, d2, ok2)
    np.testing.assert_array_equal(np.asarray(midx), [0, 1, 2, 3])
    sig = frame_signature(d1, ok1)
    assert abs(float(jnp.linalg.norm(sig)) - 1.0) < 1e-5


def test_loop_closure_detection():
    """Revisit the same view after an excursion: loop closure should fire."""
    p = Parameters()
    p.slam.keyframeDecisionMinIntervalSeconds = 0.0
    p.slam.keyframeDecisionDistanceThreshold = 0.01
    p.slam.adjacentSpaceSize = 3
    p.slam.minLoopClosureFeatureMatches = 4
    slam = Slam(p, max_ba_keyframes=8)
    rng = np.random.RandomState(2)
    landmarks = np.stack([
        5.0 + rng.rand(50), rng.randn(50) * 2, rng.randn(50)], axis=1)

    def frame_at(pos, seed):
        T = cam_pose_cw(pos, 0.0)
        ip, ok = project_to_norm(T, landmarks)
        # pixels for ORB sampling
        f = 260.0
        px = ip * f + np.array([160.0, 120.0])
        img = np.zeros((240, 320), np.float32) + 0.3
        rngl = np.random.RandomState(42)  # SAME texture at same world view
        for i in np.where(ok)[0]:
            u, v = px[i]
            if 8 <= u < 312 and 8 <= v < 232:
                iu, iv = int(u), int(v)
                amp = 0.5 if i % 2 == 0 else -0.2
                img[max(iv-2,0):iv+3, max(iu-2,0):iu+3] += amp
        return T, ip, ok, np.clip(img, 0, 1)

    # trajectory: stay, move away (new ids to simulate lost tracks), return
    positions = [np.array([0.0, 0.0, 0.0]), np.array([0.0, 0.4, 0.0]),
                 np.array([0.0, 0.8, 0.0]), np.array([0.0, 1.2, 0.0]),
                 np.array([0.0, 0.8, 0.0]), np.array([0.0, 0.4, 0.0]),
                 np.array([0.0, 0.02, 0.0])]
    for k, pos in enumerate(positions):
        T, ip, ok, img = frame_at(pos, k)
        ids = np.where(ok, np.arange(50), -1).astype(np.int32)
        if k >= 4:
            ids = np.where(ok, np.arange(50) + 1000 * k, -1).astype(np.int32)  # broken tracks
        # pass PIXELS so ORB samples real image positions
        f = 260.0
        px = ip * f + np.array([160.0, 120.0])
        slam.add_frame(img, T, ids[ok], px[ok] / f - np.array([160.0, 120.0]) / f
                       if False else ip[ok], t=float(k), frame_num=k)

    assert len(slam.loop_events) >= 1, "expected a loop closure detection"
    ev = slam.loop_events[-1]
    assert ev.n_matches >= 4


def test_slam_map_save(tmp_path):
    """end(map_save_path) writes keyframe poses + map points (reference:
    -slamMapPosesPath)."""
    import json

    p = Parameters()
    p.slam.keyframeDecisionMinIntervalSeconds = 0.0
    p.slam.keyframeDecisionDistanceThreshold = 0.01
    slam = Slam(p, max_ba_keyframes=8, compute_descriptors=False)
    rng = np.random.RandomState(1)
    landmarks = np.stack([
        4.0 + rng.rand(60) * 2, rng.randn(60) * 2, rng.randn(60) * 1], axis=1)
    for k in range(5):
        T = cam_pose_cw(np.array([0.0, k * 0.3, 0.0]), 0.0)
        ip, ok = project_to_norm(T, landmarks)
        ids = np.where(ok, np.arange(60), -1).astype(np.int32)
        slam.add_frame(None, T, ids[ok], ip[ok], t=float(k), frame_num=k)

    path = str(tmp_path / "map.jsonl")
    assert slam.end(map_save_path=path)
    poses, points = [], []
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            (points if "mapPoint" in d else poses).append(d)
    assert len(poses) == len(slam.kf_order)
    assert len(points) == len(slam.points)
    assert all("position" in d and "orientation" in d for d in poses)
