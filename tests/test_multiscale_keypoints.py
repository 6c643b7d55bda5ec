"""SLAM self-detected multi-scale keypoints (VERDICT r3 item 3).

The reference SLAM module detects its own ORB features on an 8-level x1.2
pyramid with dual FAST thresholds 20/7 (reference:
codegen/parameter_definitions.c:479-484), making loop closure robust to
viewing-DISTANCE change. Single-scale tracker-feature descriptors only match
when a place is revisited at the same distance. These tests render a flat
textured wall with true perspective scale physics (a pattern seen at 2x the
distance is half the pixel size), and assert:

1. the multi-scale detector finds keypoints across pyramid levels;
2. descriptors of the SAME world points match across a 2x distance change,
   while single-scale descriptors at the same pixels do not;
3. a loop closure where the revisit happens at 2x the original viewing
   distance verifies and applies with multi-scale keypoints, and does NOT
   with tracker-feature descriptors alone (the measured reason the
   subsystem exists).
"""
import numpy as np
import pytest

from hybvio_tpu.config import Parameters
from hybvio_tpu.slam.keypoints import make_multiscale_orb
from hybvio_tpu.slam.session import Slam

W, H = 320, 240
F = 240.0  # focal, pixels
CX, CY = W / 2.0, H / 2.0


def _make_world(seed=0, n_side=5, patch_m=0.30, span_x=3.2, span_y=2.2):
    """Landmarks on a jittered grid on the wall plane z=0, each carrying an
    8x8 random block pattern of world size patch_m (so its pixel size scales
    exactly with 1/distance)."""
    rng = np.random.RandomState(seed)
    gx, gy = np.meshgrid(
        np.linspace(-span_x / 2, span_x / 2, n_side),
        np.linspace(-span_y / 2, span_y / 2, n_side), indexing="xy")
    lms = np.stack([gx.ravel(), gy.ravel()], axis=1)
    lms += (rng.rand(*lms.shape) - 0.5) * 0.15
    patterns = rng.rand(len(lms), 8, 8).astype(np.float32)
    return lms, patterns, patch_m


def _render_wall(cam_xy, dist, lms, patterns, patch_m):
    """Render the wall from camera at (x, y, -dist) looking along +z.
    Background 0.5; pattern blocks bilinearly interpolated in WORLD coords
    (pixel footprint halves when distance doubles — true scale physics)."""
    u = np.arange(W, dtype=np.float64)
    v = np.arange(H, dtype=np.float64)
    uu, vv = np.meshgrid(u, v, indexing="xy")
    wx = cam_xy[0] + (uu - CX) / F * dist
    wy = cam_xy[1] + (vv - CY) / F * dist
    img = np.full((H, W), 0.5, np.float32)
    n = patterns.shape[1]
    for (lx, ly), pat in zip(lms, patterns):
        tx = (wx - (lx - patch_m / 2)) / patch_m * n
        ty = (wy - (ly - patch_m / 2)) / patch_m * n
        m = (tx >= 0) & (tx < n - 1e-6) & (ty >= 0) & (ty < n - 1e-6)
        if not m.any():
            continue
        x0 = np.clip(np.floor(tx).astype(int), 0, n - 1)
        y0 = np.clip(np.floor(ty).astype(int), 0, n - 1)
        x1 = np.minimum(x0 + 1, n - 1)
        y1 = np.minimum(y0 + 1, n - 1)
        fx = np.clip(tx - x0, 0, 1)
        fy = np.clip(ty - y0, 0, 1)
        val = (pat[y0, x0] * (1 - fx) * (1 - fy) + pat[y0, x1] * fx * (1 - fy)
               + pat[y1, x0] * (1 - fx) * fy + pat[y1, x1] * fx * fy)
        img = np.where(m, val.astype(np.float32), img)
    return img


def _project(cam_xy, dist, lms):
    """Landmark pixel + normalized coords from camera at (x, y, -dist)."""
    norm = (lms - np.asarray(cam_xy)) / dist
    pix = norm * F + np.array([CX, CY])
    inb = ((pix[:, 0] > 20) & (pix[:, 0] < W - 20)
           & (pix[:, 1] > 20) & (pix[:, 1] < H - 20))
    return pix, norm, inb


def test_detector_spans_pyramid_levels():
    lms, patterns, patch_m = _make_world()
    img = _render_wall((0.0, 0.0), 3.0, lms, patterns, patch_m)
    fn, N = make_multiscale_orb(H, W)
    pts, lvl, desc, ok = fn(img)
    assert ok.sum() > 60, f"too few keypoints: {ok.sum()}"
    levels = np.unique(lvl[ok])
    assert len(levels) >= 4, f"keypoints should span levels, got {levels}"
    # detected keypoints concentrate on the patterned areas: each valid
    # keypoint within its aliasing radius of SOME landmark pixel
    pix, _, inb = _project((0.0, 0.0), 3.0, lms)
    d = np.linalg.norm(pts[ok][:, None] - pix[None, inb], axis=-1)
    near = (d.min(axis=1) < 25.0).mean()
    assert near > 0.7, f"keypoints not on texture: {near:.2f} near landmarks"


def test_descriptors_match_across_2x_distance():
    """The SAME wall seen at 3 m and 6 m: multi-scale keypoint descriptors
    must produce many correct (same-landmark) matches; single-scale
    descriptors at the landmark pixels must not."""
    from hybvio_tpu.slam.host import host_jit
    from hybvio_tpu.slam.orb import match_descriptors, orb_descriptors

    lms, patterns, patch_m = _make_world(seed=3)
    img_a = _render_wall((0.0, 0.0), 3.0, lms, patterns, patch_m)
    img_b = _render_wall((0.0, 0.0), 6.0, lms, patterns, patch_m)

    fn, N = make_multiscale_orb(H, W)
    pa, la, da, oka = fn(img_a)
    pb, lb, db, okb = fn(img_b)
    P = 64 * ((N + 63) // 64)

    def pad(x, n, shape2=None):
        out = np.zeros((n,) + x.shape[1:], x.dtype)
        out[: len(x)] = x
        return out

    match = host_jit(match_descriptors)
    midx, _ = match(pad(da, P), pad(oka, P), pad(db, P), pad(okb, P))
    midx = np.asarray(midx)[:N]

    # a match is CORRECT if both endpoints project to the same landmark
    pix_a, _, _ = _project((0.0, 0.0), 3.0, lms)
    pix_b, _, _ = _project((0.0, 0.0), 6.0, lms)
    own_a = np.argmin(
        np.linalg.norm(pa[:, None] - pix_a[None], axis=-1), axis=1)
    own_b = np.argmin(
        np.linalg.norm(pb[:, None] - pix_b[None], axis=-1), axis=1)
    good = bad = 0
    for i, j in enumerate(midx):
        if 0 <= j < N and oka[i] and okb[j]:
            if own_a[i] == own_b[j]:
                good += 1
            else:
                bad += 1
    assert good >= 10, f"multi-scale matches across 2x distance: {good}"
    assert good > 2 * bad, f"match precision too low: {good} good / {bad} bad"

    # control: single-scale descriptors AT the landmark pixels do not match
    # across the distance change (the reference gap this subsystem closes)
    orb = host_jit(orb_descriptors)
    va = np.ones(len(lms), bool)
    dsa, oa = orb(img_a, pix_a.astype(np.float32), va)
    dsb, ob = orb(img_b, pix_b.astype(np.float32), va)
    m2, _ = match(np.asarray(dsa), np.asarray(oa), np.asarray(dsb),
                  np.asarray(ob))
    m2 = np.asarray(m2)
    correct_ss = sum(1 for i, j in enumerate(m2) if j == i)
    assert correct_ss < good / 2, (
        f"single-scale control should underperform: {correct_ss} vs {good}")


def _run_double_distance_loop(extra_keypoints: bool):
    """Lap 1 views the wall at 3 m; lap 2 revisits at 6 m with fresh track
    ids and accumulated odometry drift. Only scale-invariant descriptors can
    link the laps."""
    p = Parameters()
    p.slam.keyframeDecisionAlways = True
    p.slam.adjacentSpaceSize = 4
    p.slam.minLoopClosureFeatureMatches = 8
    p.slam.loopClosureRansacMinInliers = 4
    p.slam.applyLoopClosures = True
    p.slam.applyLocalBundleAdjustment = False
    p.slam.maximumDriftMetersPerSecond = 1.0
    p.slam.maximumDriftMetersPerTraveled = 1.0
    p.slam.keyframeCullEnabled = False
    p.slam.orbExtraKeyPoints = extra_keypoints
    slam = Slam(p)

    lms, patterns, patch_m = _make_world(seed=5)
    lms3 = np.concatenate([lms, np.zeros((len(lms), 1))], axis=1)

    drift = np.zeros(3)
    k = 0
    true_poses = {}
    for lap, (dist, xs) in enumerate([
            (3.0, np.linspace(-0.5, 0.5, 6)),
            (6.0, np.linspace(-0.5, 0.5, 6))]):
        for x in xs:
            cam_xy = (float(x), 0.0)
            img = _render_wall(cam_xy, dist, lms, patterns, patch_m)
            pix, norm, inb = _project(cam_xy, dist, lms)
            ids = np.where(inb, np.arange(len(lms)) + 10000 * lap, -1)
            T = np.eye(4)
            T[:3, 3] = [cam_xy[0], cam_xy[1], -dist]
            true_poses[k] = T.copy()
            T_drift = T.copy()
            if lap == 1:
                # drift PERPENDICULAR to the sweep direction: drift parallel
                # to the camera baseline inflates the triangulation baseline
                # (15%/step here), biasing lap-2 structure ~1 m deep — a
                # 3D-3D similarity then "verifies" that depth bias as drift
                # (a property of structure-based loop verification the
                # reference family shares, not of the keypoint detector)
                drift = drift + np.array([0.0, 0.05, 0.0])
                T_drift[:3, 3] += drift
            slam.add_frame(img, T_drift, ids[inb].astype(np.int32),
                           norm[inb], t=float(k), frame_num=k,
                           pix_pts=pix[inb])
            k += 1
    return slam, true_poses


def test_loop_closure_at_double_distance():
    slam, true_poses = _run_double_distance_loop(extra_keypoints=True)
    applied = [ev for ev in slam.loop_events if ev.applied]
    assert applied, (
        f"no loop applied at 2x distance; events: "
        f"{[(ev.kf_id, ev.matched_kf_id, ev.n_matches, ev.applied) for ev in slam.loop_events]}")
    # the correction must pull the drifted tail back toward ground truth
    last = slam.keyframes[slam.kf_order[-1]]
    err_corr = np.linalg.norm(
        last.pose[:3] - true_poses[last.frame_num][:3, 3])
    err_drift = np.linalg.norm(
        last.odo_pose[:3] - true_poses[last.frame_num][:3, 3])
    assert err_corr < err_drift, (
        f"correction did not help: {err_corr:.3f} vs drifted {err_drift:.3f}")


def test_no_loop_without_multiscale_keypoints():
    """Control: tracker-feature (single-scale) descriptors alone cannot
    close the 2x-distance loop — the measured gap (VERDICT r3 missing #1)."""
    slam, _ = _run_double_distance_loop(extra_keypoints=False)
    assert not any(ev.applied for ev in slam.loop_events), (
        "single-scale control unexpectedly closed the loop; the e2e no "
        "longer demonstrates scale invariance")
