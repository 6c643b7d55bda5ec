"""globalBAAfterLoop A/B evidence (VERDICT r3 item 4).

The reference offers a post-loop global structure BA behind
slam.globalBAAfterLoop (reference: codegen/parameter_definitions.c:475-476);
its entire justification is that after a loop's pose-graph correction the
map STRUCTURE is still warped — points were triangulated from drifted poses
and the pose graph only moves them rigidly through their anchor keyframe —
and only a joint pose+structure refinement removes that residual. This test
measures it: the same drifting revisit scenario is closed three ways and
both trajectory and structure error are compared:

  rigid   loopClosureRigidTransform=true  (move the recent segment rigidly)
  pg      pose-graph over all keyframes (default)
  pg+ba   pose graph + global structure BA (globalBAAfterLoop=true)

Ground truth: landmarks are known 3D points and track ids encode the
landmark index, so structure error is exact. The asserted ordering is the
reason the parameter exists: pg+ba must beat pg on structure error without
degrading the trajectory, and both graph variants must beat rigid.
"""
import numpy as np
import pytest

from hybvio_tpu.config import Parameters
from hybvio_tpu.slam.session import Slam


def _make_slam(mode: str) -> Slam:
    p = Parameters()
    p.slam.keyframeDecisionMinIntervalSeconds = 0.0
    p.slam.keyframeDecisionDistanceThreshold = 0.01
    p.slam.adjacentSpaceSize = 4
    p.slam.minLoopClosureFeatureMatches = 4
    p.slam.loopClosureRansacMinInliers = 4
    p.slam.applyLoopClosures = True
    p.slam.applyLocalBundleAdjustment = False  # isolate the post-loop solvers
    p.slam.maximumDriftMetersPerSecond = 1.0
    p.slam.maximumDriftMetersPerTraveled = 1.0
    p.slam.keyframeCullEnabled = False
    p.slam.orbExtraKeyPoints = False  # blob world; tracker descriptors suffice
    p.slam.loopClosureRigidTransform = (mode == "rigid")
    p.slam.globalBAAfterLoop = (mode == "pg+ba")
    return Slam(p)


def _run(mode: str):
    """Two out-and-back laps with linearly accumulating odometry drift
    (the test_slam_global revisit scenario, kept identical across modes)."""
    slam = _make_slam(mode)
    rng = np.random.RandomState(11)
    landmarks = np.stack([
        6.0 + rng.rand(60), rng.randn(60) * 2.5, rng.randn(60)], axis=1)

    from tests.test_slam import cam_pose_cw, project_to_norm

    def frame_at(pos):
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

    leg = [0.0, 0.35, 0.7, 1.05, 1.4, 1.05, 0.7, 0.35]
    drift_per_frame = 0.05
    gt_pos = []
    k = 0
    for lap in range(2):
        for y in leg:
            pos = np.array([0.0, y, 0.0])
            T, ip, ok, img = frame_at(pos)
            T_drift = T.copy()
            T_drift[0, 3] += drift_per_frame * k
            ids = np.where(ok, np.arange(60) + 10000 * lap, -1).astype(np.int32)
            slam.add_frame(img, T_drift, ids[ok], ip[ok], t=float(k),
                           frame_num=k)
            gt_pos.append(pos)
            k += 1
    return slam, np.asarray(gt_pos), landmarks


def _errors(slam: Slam, gt_pos: np.ndarray, landmarks: np.ndarray):
    traj = [np.linalg.norm(slam.keyframes[kid].pose[:3] - gt_pos[
        slam.keyframes[kid].frame_num]) for kid in slam.kf_order]
    struct = []
    for mp in slam.points.values():
        if mp.triangulated:
            struct.append(
                np.linalg.norm(mp.position - landmarks[mp.track_id % 10000]))
    assert len(struct) >= 20, f"too few triangulated points: {len(struct)}"
    return float(np.mean(traj)), float(np.mean(struct))


@pytest.mark.slow
def test_global_ba_after_loop_beats_pose_graph_on_structure():
    results = {}
    for mode in ("rigid", "pg", "pg+ba"):
        slam, gt_pos, landmarks = _run(mode)
        assert any(ev.applied for ev in slam.loop_events), (
            f"{mode}: no loop applied; "
            f"{[(e.kf_id, e.matched_kf_id, e.n_matches) for e in slam.loop_events]}")
        results[mode] = _errors(slam, gt_pos, landmarks)
    print("\nmode      traj_m   struct_m")
    for mode, (tr, st) in results.items():
        print(f"{mode:8s} {tr:.4f}   {st:.4f}")

    tr_r, st_r = results["rigid"]
    tr_p, st_p = results["pg"]
    tr_b, st_b = results["pg+ba"]
    # the BA variant's justification: structure error strictly below the
    # pose-graph-only residual (reference default keeps it OFF for speed,
    # parameter_definitions.c:475-476 — the win must be real to earn the cost)
    assert st_b < 0.85 * st_p, (st_b, st_p)
    # ... without giving back the trajectory win
    assert tr_b <= tr_p * 1.10 + 1e-3, (tr_b, tr_p)
    # and the graph variants must beat the rigid move on trajectory
    assert tr_p <= tr_r + 1e-3 and tr_b <= tr_r + 1e-3, (tr_p, tr_b, tr_r)
