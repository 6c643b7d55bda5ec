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

def test_visualization_mode_dispatch():
    """All 14 reference VisualizationModes render (or return None for NONE)
    from the same tagged-frame payload (reference: InternalAPI::
    VisualizationMode, internal.hpp:66-81)."""
    import jax.numpy as jnp

    from hybvio_tpu.api.visualizations import (
        VisualizationMode as M, render_video_visualization)
    from hybvio_tpu.frontend.rectify import stereo_rectify
    from hybvio_tpu.geometry.cameras import build_pinhole

    rng = np.random.RandomState(3)
    H, W = 96, 128
    g = rng.rand(H, W).astype(np.float32) * 0.5
    g2 = np.roll(g, -4, axis=1)  # crude stereo shift
    px = np.array([[40.0, 50.0], [100.0, 80.0], [20.0, 20.0]])
    prev = px - np.array([6.0, 2.0])
    stereo = px + np.array([18.0, 0.0])
    status = np.array([0, 3, 1], np.int32)
    valid = status == 0
    cam = build_pinhole(100.0, 100.0, W / 2, H / 2, width=W, height=H,
                        dtype=jnp.float32)
    i2c0 = np.eye(4)
    i2c1 = np.eye(4); i2c1[0, 3] = -0.1
    _, _, Q, _, _ = stereo_rectify(cam, cam, i2c0, i2c1, W, H)
    T10 = i2c1 @ np.linalg.inv(i2c0)

    assert render_video_visualization(M.NONE, g) is None
    for mode in (M.PLAIN_VIDEO, M.PROCESSED_VIDEO, M.TRACKER_ONLY, M.TRACKS,
                 M.DEBUG_VISUALIZATION, M.OPTICAL_FLOW,
                 M.OPTICAL_FLOW_FAILURES, M.TRACKS_ALL, M.CORNER_MEASURE,
                 M.STEREO_MATCHING, M.STEREO_EPIPOLAR, M.STEREO_DISPARITY,
                 M.STEREO_DEPTH):
        img = render_video_visualization(
            mode, g, second_gray=g2, track_pixels=px, track_prev_pixels=prev,
            track_status=status, track_valid=valid, stereo_pixels=stereo,
            cam_first=cam, cam_second=cam, T10=T10,
            Q=np.asarray(Q))
        assert img is not None and img.shape == (H, W, 3), mode
        assert np.isfinite(img).all(), mode


def test_epipolar_curves_hit_true_match():
    """The epipolar curve for a left feature must pass near the true right-
    camera projection of the 3D point (geometry sanity, not just raster)."""
    import jax.numpy as jnp

    from hybvio_tpu.api.visualizations import render_epipolar_curves
    from hybvio_tpu.geometry.cameras import build_pinhole, ray_to_pixel

    H, W = 120, 160
    cam = build_pinhole(120.0, 120.0, W / 2, H / 2, width=W, height=H,
                        dtype=jnp.float32)
    T10 = np.eye(4); T10[0, 3] = -0.12  # right camera 12 cm to the +x of left
    X = np.array([0.3, -0.1, 4.0])  # point in left cam coords
    pl, _ = ray_to_pixel(cam, jnp.asarray(X / np.linalg.norm(X), jnp.float32))
    Xr = T10[:3, :3] @ X + T10[:3, 3]
    pr, _ = ray_to_pixel(cam, jnp.asarray(Xr / np.linalg.norm(Xr), jnp.float32))
    pl, pr = np.asarray(pl), np.asarray(pr)

    g = np.zeros((H, W), np.float32)
    img = render_epipolar_curves(g, cam, cam, T10, pl[None, :],
                                 track_status=np.array([0], np.int32))
    # something was drawn, and near the true right-camera match
    y, x = int(round(pr[1])), int(round(pr[0]))
    patch = img[max(y - 2, 0):y + 3, max(x - 2, 0):x + 3]
    assert patch.max() > 0.5, (pr, patch.max())
