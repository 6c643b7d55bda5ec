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

    def blob_image(ip, vis):
        """Blob render at feature projections so ORB descriptors are
        meaningful and loop closures actually fire."""
        img = np.full((240, 320), 0.3, np.float32)
        px = ip * 260.0 + np.array([160.0, 120.0])
        for i in np.where(vis)[0]:
            u, v = px[i]
            if 8 <= u < 312 and 8 <= v < 232:
                iu, iv = int(u), int(v)
                amp = 0.5 if i % 2 == 0 else -0.2
                img[max(iv - 2, 0):iv + 3, max(iu - 2, 0):iu + 3] += amp
        return np.clip(img, 0, 1)

    lat_ms = []
    for k in range(n_kf):
        lap, i = divmod(k, kf_per_lap)
        th = 2 * np.pi * i / kf_per_lap
        pos = np.array([2.0 * np.cos(th), 2.0 * np.sin(th), 0.0])
        # camera looks outward (+z cam = radial)
        c, s = np.cos(th), np.sin(th)
        T = np.eye(4)
        T[:3, 0] = [-s, c, 0]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    res = run(n, descriptors="--descriptors" in sys.argv)
    print(json.dumps(res))
