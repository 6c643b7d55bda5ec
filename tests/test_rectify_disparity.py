"""Stereo rectification + dense disparity tests on synthetic renders."""
import jax.numpy as jnp
import numpy as np
import pytest

from hybvio_tpu.frontend.rectify import build_remap, remap, stereo_rectify, build_mono_undistort
from hybvio_tpu.frontend.disparity import (
    compute_disparity, default_max_disparity, disparity_to_depth, point_cloud,
    sample_depth,
)
from hybvio_tpu.geometry.cameras import build_pinhole, pixel_to_ray, ray_to_pixel
from hybvio_tpu.io.synthetic import SYNTH_IMU_TO_CAMERA, render_view

W, H = 320, 240
FX = 260.0
BASELINE = 0.12
I2C0 = SYNTH_IMU_TO_CAMERA
I2C1 = SYNTH_IMU_TO_CAMERA.copy()
I2C1[0, 3] = -BASELINE  # second camera: x_cam1 = x_cam0 - b => point appears left


def test_rectify_identity_for_ideal_pair():
    """Side-by-side identical pinholes: rectification ~ identity, Q recovers depth."""
    cam0 = build_pinhole(FX, FX, W / 2, H / 2, width=W, height=H)
    cam1 = build_pinhole(FX, FX, W / 2, H / 2, width=W, height=H)
    rc0, rc1, Q, R0, R1 = stereo_rectify(cam0, cam1, I2C0, I2C1, W, H)
    # the pair is already rectified: rotations should be ~identity (up to sign
    # conventions of the new axes)
    assert np.abs(np.asarray(R0) @ np.asarray(R0).T - np.eye(3)).max() < 1e-9
    assert np.abs(np.asarray(R0) - np.eye(3)).max() < 1e-6, R0

    # Q maps (x, y, disparity) to 3D: for a point at depth z, disparity must
    # be f*b/z
    z = 2.5
    disp = FX * BASELINE / z
    v = np.asarray(Q) @ np.array([W / 2 + 10, H / 2 - 5, disp, 1.0])
    p = v[:3] / v[3]
    np.testing.assert_allclose(p[2], z, rtol=1e-6)


def test_remap_identity():
    cam = build_pinhole(FX, FX, W / 2, H / 2, width=W, height=H)
    m = build_remap(cam, cam, W, H)
    ys, xs = np.mgrid[0:H, 0:W]
    np.testing.assert_allclose(np.asarray(m[..., 0]), xs, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m[..., 1]), ys, atol=1e-3)


def test_mono_undistort_map():
    cam = build_pinhole(FX, FX, W / 2 + 7, H / 2 - 4,
                        coeffs=(-0.28, 0.07, 0.0), width=W, height=H)
    target, m = build_mono_undistort(cam, W, H)
    # undistorted center maps to distorted center-ish
    c = np.asarray(m[H // 2, W // 2])
    assert np.linalg.norm(c - [W / 2 + 7, H / 2 - 4]) < 1.0


@pytest.mark.slow
def test_disparity_depth_on_rendered_pair():
    rng = np.random.RandomState(0)
    # landmarks densely in front of the cameras (IMU x = camera forward)
    n = 400
    lm = np.stack([
        2.0 + 2.0 * rng.rand(n), rng.randn(n) * 1.2, rng.randn(n) * 0.8], axis=1)
    pos = np.zeros(3)
    quat = np.array([1.0, 0, 0, 0])
    left = render_view(lm, pos, quat, I2C0, FX, FX, W / 2, H / 2, W, H, blob_sigma=1.6)
    right = render_view(lm, pos, quat, I2C1, FX, FX, W / 2, H / 2, W, H, blob_sigma=1.6)

    cam0 = build_pinhole(FX, FX, W / 2, H / 2, width=W, height=H)
    rc0, rc1, Q, R0, R1 = stereo_rectify(cam0, cam0, I2C0, I2C1, W, H)

    D = default_max_disparity(W)
    disp, valid = compute_disparity(jnp.asarray(left), jnp.asarray(right), D,
                                    block_size=11)
    depth, dvalid = disparity_to_depth(disp, valid, Q)

    # check depth at projected landmark pixels vs ground truth (camera z = imu x)
    from hybvio_tpu.io.synthetic import project_landmarks

    pix, z_gt, vis = project_landmarks(lm, pos, quat, I2C0, FX, FX, W / 2, H / 2, W, H)
    d_est = np.asarray(sample_depth(depth, dvalid, jnp.asarray(pix[vis])))
    ok = d_est > 0
    assert ok.mean() > 0.5, ok.mean()
    rel_err = np.abs(d_est[ok] - z_gt[vis][ok]) / z_gt[vis][ok]
    assert np.median(rel_err) < 0.08, np.median(rel_err)

    pts, pok = point_cloud(disp, valid, Q, stride=5)
    assert int(np.asarray(pok).sum()) > 50
