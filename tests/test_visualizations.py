"""Visualization adapter tests (raster sanity checks)."""
import numpy as np

from hybvio_tpu.api.visualizations import (
    render_correlation, render_covariance_magnitudes, render_pose_plot,
    render_video_overlay,
)


def test_video_overlay():
    g = np.zeros((120, 160), np.float32) + 0.4
    px = np.array([[40.0, 50.0], [100.0, 80.0], [-1.0, -1.0]])
    valid = np.array([True, True, False])
    trails = [np.array([[40, 50], [44, 52], [48, 55]])]
    img = render_video_overlay(g, px, valid, trails,
                               outlier_mask=np.array([False, True, False]))
    assert img.shape == (120, 160, 3)
    assert img.max() > 0.9  # markers drawn
    # outlier color (red) present near (100, 80)
    patch = img[75:85, 95:105]
    assert (patch[..., 0] > 0.9).any() and not (patch[..., 1] > 0.9).all()


def test_pose_plot():
    t = np.linspace(0, 1, 50)
    a = np.stack([t, np.cos(t * 6), np.sin(t * 6), t * 0], axis=1)
    b = a + np.array([0, 0.05, 0.02, 0])
    img = render_pose_plot({"our": a, "groundTruth": b}, size=256)
    assert img.shape == (256, 256, 3)
    assert (img > 0.5).sum() > 50


def test_cov_heatmaps():
    rng = np.random.RandomState(0)
    A = rng.randn(30, 30)
    P = A @ A.T
    m = render_covariance_magnitudes(P)
    c = render_correlation(P)
    assert m.shape == (30, 30, 3) and c.shape == (30, 30, 3)
    assert np.isfinite(m).all() and np.isfinite(c).all()
    # diagonal correlation = 1 -> pure red
    assert (c[np.arange(30), np.arange(30), 0] > 0.99).all()


def test_imu_plot():
    from hybvio_tpu.api.visualizations import render_imu_plot

    rng = np.random.RandomState(0)
    img = render_imu_plot(rng.randn(100, 3) * 0.1,
                          rng.randn(80, 3) + np.array([0, 0, 9.8]))
    assert img.shape == (256, 512, 3)
    assert np.isfinite(img).all()
    assert (img > 0.2).sum() > 100  # polylines drawn


def test_video_overlay_flow_status():
    """Tagged-frame payload rendering: per-slot flow vectors colored by
    lifecycle status + stereo match segments (reference: TaggedFrame
    flowCorners/flowStatus, odometry/tagged_frame.hpp:48-58)."""
    g = np.zeros((120, 160), np.float32) + 0.2
    px = np.array([[40.0, 50.0], [100.0, 80.0], [20.0, 20.0], [-1.0, -1.0]])
    prev = np.array([[30.0, 45.0], [90.0, 70.0], [20.0, 20.0], [-1.0, -1.0]])
    status = np.array([0, 3, 1, -1], np.int32)  # TRACKED, OUTLIER, NEW, empty
    valid = np.array([True, False, False, False])
    stereo = px + np.array([25.0, 0.0])
    img = render_video_overlay(g, px, valid, flow_prev=prev,
                               track_status=status, stereo_pixels=stereo)
    assert img.shape == (120, 160, 3)
    # green flow segment between prev[0] and px[0]
    seg = img[45:51, 30:41]
    assert (seg[..., 1] > 0.9).any()
    # red outlier flow near (95, 75)
    seg2 = img[70:81, 90:101]
    assert (seg2[..., 0] > 0.9).any()
    # stereo segment drawn right of the tracked corner
    seg3 = img[49:52, 41:65]
    assert (seg3[..., 2] > 0.9).any()
    # empty slot (-1) drew nothing at its corner
    assert (img[18:23, 0:4] <= 0.21).all()
