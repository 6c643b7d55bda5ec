"""Global SLAM consistency: BoW vocabulary retrieval (recall/precision),
pose-graph optimization, loop-closure drift removal across the WHOLE
trajectory, drift-gate units, and map-size plateau under culling.

Reference behavior contract: DBoW2 vocabulary retrieval + global adjustment
after loops + keyframe/map-point culling (codegen/parameter_definitions.c:
369-388, 448-476, 459-466)."""
import numpy as np
import pytest

import jax.numpy as jnp

from hybvio_tpu.config import Parameters
from hybvio_tpu.slam.session import Slam, LoopEdge, pose_to_mat, mat_to_pose
from hybvio_tpu.slam.vocabulary import Vocabulary


# ------------------------------------------------------------- vocabulary

def _fake_descriptors(rng, n, flip_bits=0, base=None):
    """Binary +/-1 descriptors; optionally noisy copies of a base set."""
    if base is None:
        d = np.sign(rng.randn(n, 256)).astype(np.float32)
    else:
        d = base.copy()
        for i in range(d.shape[0]):
            idx = rng.choice(256, flip_bits, replace=False)
            d[i, idx] *= -1
    return d


def test_vocabulary_recall_precision():
    """Queries at revisited places must retrieve the right old keyframe;
    distinct places must not cross-fire (measured recall/precision)."""
    rng = np.random.RandomState(7)
    vocab = Vocabulary(n_words=256, train_size=300, seed=1)

    n_places = 12
    per_place = np.array([30] * n_places)
    bases = [_fake_descriptors(rng, per_place[i]) for i in range(n_places)]

    # first pass: one keyframe per place (ids 0..11)
    for i in range(n_places):
        vocab.add_keyframe(i, bases[i])
    assert vocab.trained  # online k-means kicked in

    # revisit pass: noisy copies (ids 100..111)
    hits = 0
    false_hits = 0
    for i in range(n_places):
        qid = 100 + i
        noisy = _fake_descriptors(rng, per_place[i], flip_bits=10, base=bases[i])
        vocab.add_keyframe(qid, noisy)
        got = vocab.query(qid, exclude=set(range(100, 200)),
                          min_in_common_ratio=0.3, max_results=1)
        if got:
            if got[0][0] == i:
                hits += 1
            else:
                false_hits += 1
    recall = hits / n_places
    assert recall >= 0.8, f"vocabulary recall too low: {recall}"
    assert false_hits <= 1, f"vocabulary precision too low: {false_hits} wrong"


def test_vocabulary_score_symmetry_and_identity():
    rng = np.random.RandomState(3)
    vocab = Vocabulary(n_words=128, train_size=10**9)  # stays LSH
    a = _fake_descriptors(rng, 40)
    b = _fake_descriptors(rng, 40)
    vocab.add_keyframe(0, a)
    vocab.add_keyframe(1, _fake_descriptors(rng, 40, flip_bits=4, base=a))
    vocab.add_keyframe(2, b)
    s_self = vocab.score(0, 1)
    s_cross = vocab.score(0, 2)
    assert s_self > s_cross
    assert abs(vocab.score(0, 2) - vocab.score(2, 0)) < 1e-9


def test_vocabulary_remove_keyframe():
    rng = np.random.RandomState(5)
    vocab = Vocabulary(n_words=64, train_size=10**9)
    vocab.add_keyframe(0, _fake_descriptors(rng, 20))
    vocab.add_keyframe(1, _fake_descriptors(rng, 20))
    vocab.remove_keyframe(0)
    assert vocab.n_docs == 1
    assert 0 not in vocab.words
    assert all(0 not in s for s in vocab.inverted.values())
    assert vocab.query(1, exclude=set()) == []  # nothing left to retrieve


# -------------------------------------------------------------- pose graph

def _chain_poses(n, step=0.5):
    """Straight-line ground truth along +y."""
    poses = np.zeros((n, 7))
    poses[:, 3] = 1.0
    poses[:, 1] = np.arange(n) * step
    return poses


def test_pose_graph_removes_accumulated_drift():
    """A drifted chain + one exact loop edge: optimization must pull the
    whole trajectory back toward ground truth (not just the tail)."""
    from hybvio_tpu.slam.ba import _relative_pose
    from hybvio_tpu.slam.posegraph import (
        PoseGraphProblem, next_pow2, optimize_pose_graph)

    n = 12
    gt = _chain_poses(n)
    # odometry measurements: exact relative steps
    rels = np.stack([np.asarray(_relative_pose(jnp.asarray(gt[i]), jnp.asarray(gt[i + 1])))
                     for i in range(n - 1)])
    # initial estimate: linearly accumulating x-drift
    est = gt.copy()
    est[:, 0] += np.linspace(0.0, 0.6, n)

    N = next_pow2(n)
    poses = np.zeros((N, 7)); poses[:, 3] = 1.0
    poses[:n] = est
    edges = [(i, i + 1, rels[i], 1.0, 1.0) for i in range(n - 1)]
    # loop edge: pose 0 -> pose n-1 exact relative (as from a verified loop)
    loop_rel = np.asarray(_relative_pose(jnp.asarray(gt[0]), jnp.asarray(gt[n - 1])))
    edges.append((0, n - 1, loop_rel, 10.0, 10.0))

    E = next_pow2(len(edges))
    ei = np.zeros(E, np.int32); ej = np.zeros(E, np.int32)
    erel = np.zeros((E, 7)); erel[:, 3] = 1.0
    ewp = np.zeros(E); ewr = np.zeros(E)
    for k, (i, j, rel, wp, wr) in enumerate(edges):
        ei[k], ej[k], erel[k], ewp[k], ewr[k] = i, j, rel, wp, wr

    prob = PoseGraphProblem(
        poses=jnp.asarray(poses), pose_valid=jnp.asarray(np.arange(N) < n),
        edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
        edge_rel=jnp.asarray(erel), edge_w_pos=jnp.asarray(ewp),
        edge_w_rot=jnp.asarray(ewr))
    out = np.asarray(optimize_pose_graph(prob, iterations=15))[:n]

    err_before = np.linalg.norm(est[:, :3] - gt[:, :3], axis=1)
    err_after = np.linalg.norm(out[:, :3] - gt[:, :3], axis=1)
    assert err_after.max() < 0.05, err_after
    assert err_after.max() < 0.1 * err_before.max()


# ------------------------------------------------------------- drift gates

def _drift_gate_slam(max_mps=0.1, max_mpt=0.1):
    p = Parameters()
    p.slam.applyLoopClosures = True
    p.slam.maximumDriftMetersPerSecond = max_mps
    p.slam.maximumDriftMetersPerTraveled = max_mpt
    return Slam(p)


def test_drift_gate_units():
    """drift_m <= rate * dt (NOT rate * dt^2): a 0.5 m drift over 10 s with a
    0.1 m/s gate must pass; the same drift over 2 s must fail."""
    slam = _drift_gate_slam()
    ps = slam.ps

    def gate(drift_m, dt, traveled):
        ok = True
        if drift_m > ps.maximumDriftMetersPerSecond * dt:
            ok = False
        if drift_m > ps.maximumDriftMetersPerTraveled * max(traveled, 1e-6):
            ok = False
        return ok

    # mirror of session logic (kept in sync by the e2e test below)
    assert gate(0.5, dt=10.0, traveled=10.0)
    assert not gate(0.5, dt=2.0, traveled=10.0)
    assert not gate(0.5, dt=10.0, traveled=1.0)  # per-traveled gate


# ------------------------------------- loop-closure e2e with drift removal

def _revisit_run(apply_loops: bool, n_loops_of_circle: int = 2):
    """Square loop walked n times with injected odometry drift; landmarks on
    the surrounding walls; returns (slam, gt_positions per keyframe)."""
    p = Parameters()
    p.slam.keyframeDecisionMinIntervalSeconds = 0.0
    p.slam.keyframeDecisionDistanceThreshold = 0.01
    p.slam.adjacentSpaceSize = 4
    p.slam.minLoopClosureFeatureMatches = 4
    p.slam.loopClosureRansacMinInliers = 4
    p.slam.applyLoopClosures = apply_loops
    p.slam.applyLocalBundleAdjustment = False  # isolate loop-closure effect
    p.slam.maximumDriftMetersPerSecond = 1.0
    p.slam.maximumDriftMetersPerTraveled = 1.0
    p.slam.keyframeCullEnabled = False
    slam = Slam(p)

    rng = np.random.RandomState(11)
    landmarks = np.stack([
        6.0 + rng.rand(60), rng.randn(60) * 2.5, rng.randn(60)], axis=1)

    def frame_at(pos):
        from tests.test_slam import cam_pose_cw, project_to_norm
        T = cam_pose_cw(pos, 0.0)
        ip, ok = project_to_norm(T, landmarks)
        f = 260.0
        px = ip * f + np.array([160.0, 120.0])
        img = np.zeros((240, 320), np.float32) + 0.3
        for i in np.where(ok)[0]:
            u, v = px[i]
            if 8 <= u < 312 and 8 <= v < 232:
                iu, iv = int(u), int(v)
                amp = 0.5 if i % 2 == 0 else -0.2
                img[max(iv - 2, 0):iv + 3, max(iu - 2, 0):iu + 3] += amp
        return T, ip, ok, np.clip(img, 0, 1)

    # out-and-back along y, repeated; drift accumulates in x on odometry
    leg = [0.0, 0.35, 0.7, 1.05, 1.4, 1.05, 0.7, 0.35]
    gt_pos = []
    k = 0
    # drift must exceed the map-point-search reprojection window by the time
    # of the first revisit (0.05*8 frames = 0.4 m > window*depth ~ 0.24 m):
    # smaller drift is now legitimately absorbed by map-point reassociation
    # (the local-map search), which would leave nothing for the loop-closure
    # 3D-3D verification to verify — the loop pipeline owns the FAR-gap case
    drift_per_frame = 0.05
    for lap in range(n_loops_of_circle):
        for y in leg:
            pos = np.array([0.0, y, 0.0])
            T, ip, ok, img = frame_at(pos)
            # inject odometry drift into the fed pose
            T_drift = T.copy()
            T_drift[0, 3] += drift_per_frame * k
            # track ids persist WITHIN a lap (so map points triangulate) but
            # break across laps (so the revisit is only linkable via loop
            # closure, like real lost tracks)
            ids = np.where(ok, np.arange(60) + 10000 * lap, -1).astype(np.int32)
            slam.add_frame(img, T_drift, ids[ok], ip[ok], t=float(k), frame_num=k)
            gt_pos.append(pos)
            k += 1
    return slam, np.asarray(gt_pos)


@pytest.mark.slow
def test_loop_closure_removes_global_drift():
    slam_off, _ = _revisit_run(apply_loops=False)
    slam_on, _ = _revisit_run(apply_loops=True)

    applied = [e for e in slam_on.loop_events if e.applied]
    assert applied, "expected at least one APPLIED loop closure"
    assert slam_on.loop_edges, "loop edge must be recorded"

    def revisit_err(slam):
        # ground-truth positions repeat with period 8 (one lap): keyframes one
        # lap apart observe the same spot, so their poses should coincide;
        # without loop closure they differ by one lap of accumulated drift
        kfs = [slam.keyframes[k].pose[:3] for k in slam.kf_order]
        pairs = [(i, i + 8) for i in range(len(kfs) - 8)]
        return float(np.mean([np.linalg.norm(kfs[i] - kfs[j]) for i, j in pairs]))

    # with loops applied, revisits coincide far better than the drifting run
    assert revisit_err(slam_on) < 0.5 * revisit_err(slam_off), (
        revisit_err(slam_on), revisit_err(slam_off))


@pytest.mark.slow
def test_keyframe_culling_bounds_map():
    """Revisiting the same small scene many times must NOT grow keyframes
    without bound when culling is on (reference: keyframeCullEnabled)."""
    p = Parameters()
    p.slam.keyframeDecisionMinIntervalSeconds = 0.0
    p.slam.keyframeDecisionDistanceThreshold = 0.01
    p.slam.adjacentSpaceSize = 3
    p.slam.keyframeCullEnabled = True
    p.slam.applyLocalBundleAdjustment = False
    slam = Slam(p, compute_descriptors=False)

    rng = np.random.RandomState(2)
    landmarks = np.stack([
        5.0 + rng.rand(40), rng.randn(40) * 2, rng.randn(40)], axis=1)
    from tests.test_slam import cam_pose_cw, project_to_norm

    sizes = []
    k = 0
    for lap in range(8):
        for y in [0.0, 0.3, 0.6, 0.3]:
            T = cam_pose_cw(np.array([0.0, y, 0.0]), 0.0)
            ip, ok = project_to_norm(T, landmarks)
            ids = np.where(ok, np.arange(40), -1).astype(np.int32)
            slam.add_frame(None, T, ids[ok], ip[ok], t=float(k), frame_num=k)
            sizes.append(len(slam.kf_order))
            k += 1

    # keyframe count must plateau: last two laps add (almost) nothing
    assert sizes[-1] <= sizes[-9] + 1, sizes
    # map points bounded by the number of distinct tracks
    assert len(slam.points) <= 40


def test_keyframe_viz_storage_and_matching():
    """store_keyframe_images keeps thumbs + ORB pixel positions and records
    adjacent-keyframe matches + loop-event match pairs (the cmd slam group
    viewer payload: -visualizeOrbMatching / -displayKeyframe)."""
    import numpy as np

    from hybvio_tpu.config import Parameters
    from hybvio_tpu.io.synthetic import SYNTH_IMU_TO_CAMERA, generate_sequence
    from hybvio_tpu.io.textured import TexturedScene, textured_frame_renderer
    from hybvio_tpu.slam.session import Slam

    p = Parameters()
    p.slam.keyframeDecisionAlways = True
    seq = generate_sequence(duration=3.0, imu_rate=100.0, frame_rate=10.0,
                            seed=8, radius=2.0)
    scene = TexturedScene(seed=8, wall_radius=6.0)
    render = textured_frame_renderer(scene, seq, SYNTH_IMU_TO_CAMERA,
                                     260.0, 260.0, 160.0, 120.0, 320, 240)
    s = Slam(p)
    s.store_keyframe_images = True
    rng = np.random.RandomState(0)
    F = 40
    ids = np.arange(F)
    pts = 0.5 * (rng.rand(F, 2) * 2 - 1)
    for fi in range(5):
        k = int(seq.frame_sample_idx[fi])
        pose = np.eye(4)
        pose[:3, 3] = seq.pos[k]
        s.add_frame(render(fi), pose, ids, pts, float(seq.times[k]), fi)
        pts = pts + 0.002 * rng.randn(F, 2)

    assert len(s.kf_order) == 5
    kf = s.keyframes[s.kf_order[-1]]
    assert kf.thumb is not None and kf.thumb.shape == (120, 160)
    assert kf.pix_pts is not None and len(kf.pix_pts) == len(kf.track_ids)
    ka, kb, pairs = s.last_adjacent_matches
    assert (ka, kb) == (s.kf_order[-1], s.kf_order[-2])
    assert len(pairs) >= 1  # same scene, slightly moved points must match
    proj, obs = s.map_points_in_keyframe(kf.kf_id)
    assert obs.shape[1] == 2
    # without the flag, no storage cost
    s2 = Slam(p)
    s2.add_frame(render(0), np.eye(4), ids, pts, 0.0, 0)
    assert s2.keyframes[s2.kf_order[0]].thumb is None
