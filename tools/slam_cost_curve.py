#!/usr/bin/env python
"""Measure per-keyframe SLAM cost as the map grows (VERDICT round-2 item 8:
bounded SLAM global-optimization growth).

Drives a 200-keyframe synthetic session (landmarks on a surrounding wall,
revisit laps so loop closures + map-point search stay active) and reports
the per-keyframe add_frame latency by keyframe-count bucket. Bounded growth
means the last bucket is not drastically slower than the steady state:
local BA is windowed (localBAProblemSize), the pose graph only re-solves on
NEW or still-significant loops, and loop edges dedup per keyframe pair.

Usage: python tools/slam_cost_curve.py [n_keyframes] [--descriptors]
Prints one JSON line {buckets: [...], ms_per_kf: [...], ...}.

Measured (200 keyframes, 8 laps over 120 landmarks, --descriptors, CPU):
ms_per_kf [191, 150, 151, 166] (growth ratio last/second bucket 1.11,
p95 194 ms), 133 loop closures applied, map PLATEAUS at 127 points —
bounded per-keyframe cost with loop closures and map-point reassociation
active the whole session.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(n_kf: int = 200, descriptors: bool = False, kf_per_lap: int = 25,
        n_landmarks: int = 120, seed: int = 4):
    from hybvio_tpu.config import Parameters
    from hybvio_tpu.slam.session import Slam

    p = Parameters()
    p.slam.keyframeDecisionAlways = True
    p.slam.applyLoopClosures = True
    p.slam.applyLocalBundleAdjustment = True
    p.slam.adjacentSpaceSize = 8
    p.slam.minLoopClosureFeatureMatches = 4
    p.slam.loopClosureRansacMinInliers = 4
    slam = Slam(p, compute_descriptors=descriptors)

    rng = np.random.RandomState(seed)
    ang_l = rng.rand(n_landmarks) * 2 * np.pi
    z_l = rng.rand(n_landmarks) * 2 - 1
    landmarks = np.stack(
        [5.5 * np.cos(ang_l), 5.5 * np.sin(ang_l), z_l], axis=1)

    # per-landmark appearance signature: a deterministic 31x31 patch per
    # landmark INDEX (stable across laps), sized to the ORB/BRIEF sampling
    # window (slam/orb.py _PATCH_R = 15). Smaller or two-valued blobs make
    # all descriptors near-identical (most BRIEF pairs land on flat
    # background), so the Lowe ratio test kills every loop-closure match.
    patch_rng = np.random.RandomState(seed + 1)
    PR = 15
    patches = patch_rng.rand(n_landmarks, 2 * PR + 1, 2 * PR + 1).astype(
        np.float32) - 0.5

    def blob_image(ip, vis):
        """Render per-landmark signature patches at feature projections so
        ORB descriptors are discriminative and loop closures can fire."""
        img = np.full((240, 320), 0.3, np.float32)
        px = ip * 260.0 + np.array([160.0, 120.0])
        for i in np.where(vis)[0]:
            u, v = px[i]
            if PR + 1 <= u < 320 - PR - 1 and PR + 1 <= v < 240 - PR - 1:
                iu, iv = int(u), int(v)
                img[iv - PR:iv + PR + 1, iu - PR:iu + PR + 1] += 0.6 * patches[i]
        return np.clip(img, 0, 1)

    lat_ms = []
    for k in range(n_kf):
        lap, i = divmod(k, kf_per_lap)
        th = 2 * np.pi * i / kf_per_lap
        pos = np.array([2.0 * np.cos(th), 2.0 * np.sin(th), 0.0])
        # camera looks outward (+z cam = radial); right-handed frame:
        # x = y x z = (0,0,-1) x (c,s,0) = (s,-c,0). (An earlier version used
        # x=(-s,c,0), a det=-1 REFLECTION — self-consistent for rendering,
        # but quaternion-based SLAM triangulation cannot represent it and
        # every map point landed meters off, silently killing loop
        # verification.)
        c, s = np.cos(th), np.sin(th)
        T = np.eye(4)
        T[:3, 0] = [s, -c, 0]
        T[:3, 1] = [0, 0, -1]
        T[:3, 2] = [c, s, 0]
        T[:3, 3] = pos
        rel = landmarks - pos
        Xc = rel @ T[:3, :3]
        vis = Xc[:, 2] > 0.5
        ip = Xc[:, :2] / np.where(vis, Xc[:, 2], 1.0)[:, None]
        vis &= (np.abs(ip) < 0.6).all(axis=1)
        ids = np.where(vis, lap * 10000 + np.arange(n_landmarks), -1)
        img = blob_image(ip, vis) if descriptors else None
        t0 = time.perf_counter()
        slam.add_frame(img, T, ids[vis].astype(np.int32), ip[vis],
                       t=float(k) * 0.5, frame_num=k)
        lat_ms.append(1000.0 * (time.perf_counter() - t0))

    lat = np.asarray(lat_ms)
    warm = 5  # exclude jit compiles of the BA/pose-graph/ORB programs
    lat_w = lat.copy()
    lat_w[:warm] = np.median(lat)
    q = max(n_kf // 4, 1)
    buckets = [f"kf {i * q}-{(i + 1) * q - 1}" for i in range(4)]
    per_bucket = [round(float(np.mean(lat_w[i * q:(i + 1) * q])), 2)
                  for i in range(4)]
    return {
        "n_keyframes": n_kf,
        "descriptors": descriptors,
        "buckets": buckets,
        "ms_per_kf": per_bucket,
        "p95_ms": round(float(np.percentile(lat, 95)), 2),
        "max_ms": round(float(lat.max()), 2),
        "kept_keyframes": len(slam.kf_order),
        "map_points": len(slam.points),
        "loop_edges": len(slam.loop_edges),
        "loops_applied": sum(1 for e in slam.loop_events if e.applied),
        "growth_ratio_last_vs_second_bucket": round(
            float(per_bucket[3] / max(per_bucket[1], 1e-9)), 2),
    }


if __name__ == "__main__":
    # pin to local CPU: this measures SLAM HOST-side per-keyframe latency;
    # remote-TPU tunnel compiles (minutes) would land in the latency
    # buckets and the ORB/BA jits here are small enough for CPU
    import jax

    jax.config.update("jax_platforms", "cpu")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    res = run(n, descriptors="--descriptors" in sys.argv)
    print(json.dumps(res))
