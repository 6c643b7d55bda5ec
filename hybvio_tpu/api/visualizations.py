"""Visualization adapters: video overlays, pose plot, covariance heatmap.

Port of the reference visualization surface (reference: src/api/
visualizations.cpp, src/views/api_visualization_helpers.cpp,
visualization_pose.cpp, visualization_internals.cpp) as dependency-free numpy
raster drawing: track trails/corners on video frames, a 2D trajectory plot
comparing methods, and covariance magnitude/correlation heatmaps straight
from the EKF covariance.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

# simple color palette (RGB float)
COLORS = {
    "track": (0.1, 1.0, 0.2),
    "corner": (1.0, 0.9, 0.1),
    "outlier": (1.0, 0.2, 0.2),
    "slam": (0.3, 0.5, 1.0),
    "our": (0.1, 1.0, 0.2),
    "groundTruth": (1.0, 1.0, 1.0),
    "ARKit": (1.0, 0.5, 0.1),
    "gps": (0.9, 0.2, 0.9),
}


def to_rgb(gray: np.ndarray) -> np.ndarray:
    g = np.clip(np.asarray(gray, dtype=np.float32), 0, 1)
    return np.repeat(g[..., None], 3, axis=-1)


def draw_circle(img: np.ndarray, x: float, y: float, r: int, color, filled=False):
    H, W = img.shape[:2]
    x0, x1 = int(max(x - r, 0)), int(min(x + r + 1, W))
    y0, y1 = int(max(y - r, 0)), int(min(y + r + 1, H))
    if x1 <= x0 or y1 <= y0:
        return
    ys, xs = np.mgrid[y0:y1, x0:x1]
    d2 = (xs - x) ** 2 + (ys - y) ** 2
    mask = d2 <= r * r if filled else (d2 <= r * r) & (d2 >= (r - 1.5) ** 2)
    img[y0:y1, x0:x1][mask] = color


def draw_line(img: np.ndarray, x0, y0, x1, y1, color):
    H, W = img.shape[:2]
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) + 1
    xs = np.linspace(x0, x1, n).round().astype(int)
    ys = np.linspace(y0, y1, n).round().astype(int)
    ok = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    img[ys[ok], xs[ok]] = color


# per-status flow/corner colors (reference draws Feature::Status-dependent
# colors in api_visualization_helpers.cpp; codes = frontend.tracker.ST_*)
STATUS_COLORS = {
    0: (0.1, 1.0, 0.2),   # TRACKED — green
    1: (1.0, 0.9, 0.1),   # NEW — yellow
    2: (0.5, 0.5, 0.5),   # FAILED_FLOW — gray
    3: (1.0, 0.2, 0.2),   # RANSAC_OUTLIER — red
    4: (0.4, 0.4, 0.4),   # FLOW_OUT_OF_RANGE — dark gray
    5: (0.4, 0.4, 0.4),   # OUT_OF_RANGE
    6: (1.0, 0.2, 1.0),   # FAILED_EPIPOLAR_CHECK — magenta
    7: (1.0, 0.6, 0.1),   # CULLED — orange
    8: (0.7, 0.1, 0.1),   # BLACKLISTED — dark red
}


def render_video_overlay(gray, track_pixels, track_valid, track_trails=None,
                         outlier_mask=None, slam_points_px=None,
                         flow_prev=None, track_status=None,
                         stereo_pixels=None) -> np.ndarray:
    """VIDEO visualization: corners + track trails (+ SLAM reprojections)
    (reference: api_visualization_helpers.cpp). With flow_prev/track_status
    (the TaggedFrame flowCorners/flowStatus payload,
    odometry/tagged_frame.hpp:48-58) every slot draws its attempted flow
    vector colored by lifecycle status; stereo_pixels adds the left->right
    match segments (epipolar visualization stand-in)."""
    img = to_rgb(gray)
    px = np.asarray(track_pixels)
    valid = np.asarray(track_valid)
    out = np.asarray(outlier_mask) if outlier_mask is not None else np.zeros_like(valid)
    if track_trails is not None:
        for trail in track_trails:
            t = np.asarray(trail)
            for i in range(len(t) - 1):
                draw_line(img, t[i, 0], t[i, 1], t[i + 1, 0], t[i + 1, 1], COLORS["track"])
    status = None if track_status is None else np.asarray(track_status)
    if flow_prev is not None and status is not None:
        prev = np.asarray(flow_prev)
        for i in np.where(status >= 0)[0]:
            c = STATUS_COLORS.get(int(status[i]), COLORS["corner"])
            if status[i] != 1:  # NEW has no flow history
                draw_line(img, prev[i, 0], prev[i, 1], px[i, 0], px[i, 1], c)
    if stereo_pixels is not None and status is not None:
        sp = np.asarray(stereo_pixels)
        for i in np.where(status == 0)[0]:
            draw_line(img, px[i, 0], px[i, 1], sp[i, 0], sp[i, 1], COLORS["slam"])
    for i in np.where(valid)[0]:
        if status is not None:
            c = STATUS_COLORS.get(int(status[i]), COLORS["corner"])
        else:
            c = COLORS["outlier"] if out[i] else COLORS["corner"]
        draw_circle(img, px[i, 0], px[i, 1], 3, c)
    if slam_points_px is not None:
        for p in np.asarray(slam_points_px):
            if p[0] >= 0:
                draw_circle(img, p[0], p[1], 2, COLORS["slam"], filled=True)
    return img


def render_pose_plot(histories: Dict[str, np.ndarray], size: int = 512,
                     axes: Tuple[int, int] = (0, 1)) -> np.ndarray:
    """POSE visualization: 2D trajectory comparison
    (reference: visualization_pose.cpp). histories: name -> (N, >=3) positions
    (or (N, >=4) with time in column 0, auto-detected)."""
    img = np.zeros((size, size, 3), np.float32) + 0.08
    allpts = []
    series = {}
    for name, h in histories.items():
        h = np.asarray(h)
        pts = h[:, 1:4] if h.shape[1] >= 4 else h[:, :3]
        series[name] = pts[:, list(axes)]
        allpts.append(series[name])
    if not allpts:
        return img
    cat = np.concatenate(allpts)
    lo = cat.min(axis=0)
    hi = cat.max(axis=0)
    span = np.maximum(hi - lo, 1e-6).max()
    margin = 20

    def to_px(p):
        q = (p - (lo + hi) / 2) / span * (size - 2 * margin)
        return q[0] + size / 2, size / 2 - q[1]

    for name, pts in series.items():
        color = COLORS.get(name, (0.7, 0.7, 0.7))
        for i in range(len(pts) - 1):
            x0, y0 = to_px(pts[i])
            x1, y1 = to_px(pts[i + 1])
            draw_line(img, x0, y0, x1, y1, color)
    return img


def render_covariance_magnitudes(P: np.ndarray, size: Optional[int] = None) -> np.ndarray:
    """COVARIANCE_MAGNITUDES visualization: log-magnitude heatmap of the EKF
    covariance (reference: api.cpp:956-966, visualization_internals.cpp)."""
    P = np.asarray(P)
    mag = np.log10(np.abs(P) + 1e-12)
    mag = (mag - mag.min()) / max(mag.max() - mag.min(), 1e-9)
    img = np.stack([mag, 0.2 + 0.6 * mag, 1.0 - mag], axis=-1).astype(np.float32)
    return img


def render_correlation(P: np.ndarray) -> np.ndarray:
    """KF_CORRELATION visualization: correlation heatmap (cov2corr;
    reference: src/odometry/util.hpp cov2corr + visualization_internals)."""
    P = np.asarray(P)
    d = np.sqrt(np.clip(np.diag(P), 1e-30, None))
    C = P / d[:, None] / d[None, :]
    C = np.clip(C, -1, 1)
    img = np.zeros(C.shape + (3,), np.float32)
    img[..., 0] = np.clip(C, 0, 1)
    img[..., 2] = np.clip(-C, 0, 1)
    img[..., 1] = 0.15
    return img


def render_imu_plot(gyro_samples: np.ndarray, acc_samples: np.ndarray,
                    width: int = 512, height: int = 256) -> np.ndarray:
    """Scrolling gyro/acc sample plot (reference:
    src/commandline/imu_visualization.hpp): two stacked panels, one polyline
    per axis, latest samples on the right. Inputs: (N, 3) arrays of the most
    recent samples (any N; resampled to the panel width)."""
    img = np.zeros((height, width, 3), np.float32)
    half = height // 2
    panels = [(np.asarray(gyro_samples, float), 0),
              (np.asarray(acc_samples, float), half)]
    colors = [(1.0, 0.3, 0.3), (0.3, 1.0, 0.3), (0.4, 0.5, 1.0)]
    for samples, y0 in panels:
        if samples.size == 0:
            continue
        n = samples.shape[0]
        lo = samples.min()
        hi = samples.max()
        span = max(hi - lo, 1e-6)
        xs = np.linspace(0, width - 1, n).astype(int)
        for axis in range(min(3, samples.shape[1])):
            ys = y0 + ((hi - samples[:, axis]) / span * (half - 1)).astype(int)
            for i in range(n - 1):
                draw_line(img, xs[i], ys[i], xs[i + 1], ys[i + 1], colors[axis])
        img[y0, :, :] = 0.25
    return img
