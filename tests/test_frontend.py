"""Front-end tests: pyramid, GFTT detection, pyramidal LK, RANSAC2."""
import jax
import jax.numpy as jnp
import numpy as np

from hybvio_tpu.frontend.pyramid import (
    bilinear_sample, build_pyramid, pyr_down, scharr_gradients,
)
from hybvio_tpu.frontend.gftt import corner_response, detect_corners
from hybvio_tpu.frontend.lk import LKParams, lk_track_pyramid, precompute_prev
from hybvio_tpu.frontend.ransac import ransac2
from hybvio_tpu.geometry.cameras import build_pinhole
from hybvio_tpu.io.synthetic import render_frame


def checkerboard(h, w, size=16):
    yy, xx = np.mgrid[0:h, 0:w]
    return (((yy // size) + (xx // size)) % 2).astype(np.float32)


def textured_image(h=120, w=160, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.stack([rng.rand(40) * (w - 20) + 10, rng.rand(40) * (h - 20) + 10], axis=1)
    depths = np.ones(40)
    return render_frame(pts, depths, np.ones(40, bool), w, h, seed=seed), pts


def shift_image(img, dx, dy):
    """Subpixel shift via bilinear sampling."""
    h, w = img.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    pts = jnp.asarray(np.stack([xx - dx, yy - dy], axis=-1))
    return np.asarray(bilinear_sample(jnp.asarray(img), pts))


def test_pyr_down_shape_and_smoothing():
    img = jnp.asarray(checkerboard(64, 96))
    d = pyr_down(img)
    assert d.shape == (32, 48)
    assert float(d.min()) >= 0.0 and float(d.max()) <= 1.0
    pyr = build_pyramid(img, 3)
    assert pyr[3].shape == (8, 12)


def test_bilinear_sample_exact_on_grid():
    img = jnp.asarray(np.arange(20.0).reshape(4, 5))
    v = bilinear_sample(img, jnp.asarray([[2.0, 1.0], [0.5, 0.0]]))
    np.testing.assert_allclose(np.asarray(v), [7.0, 0.5])


def test_corner_response_peaks_on_corners():
    img = jnp.asarray(checkerboard(64, 64, 16))
    resp = np.asarray(corner_response(img))
    # corners of the checkerboard squares (multiples of 16) respond strongest
    peak = np.unravel_index(resp[8:-8, 8:-8].argmax(), resp[8:-8, 8:-8].shape)
    py, px = peak[0] + 8, peak[1] + 8
    assert min(py % 16, 16 - py % 16) <= 2
    assert min(px % 16, 16 - px % 16) <= 2


def test_detect_corners_finds_blobs():
    img_np, pts = textured_image()
    img = jnp.asarray(img_np)
    no_exist = jnp.zeros((1, 2)), jnp.zeros((1,), bool)
    xy, score, valid = detect_corners(
        img, 24, no_exist[0], no_exist[1], mask_radius=0.0, min_distance=8.0,
        min_response=1e-4)
    xy = np.asarray(xy)[np.asarray(valid)]
    assert len(xy) >= 10
    # each detected corner should be near some blob center
    d = np.linalg.norm(xy[:, None, :] - pts[None, :, :], axis=-1).min(axis=1)
    assert np.median(d) < 3.0
    # detections respect min distance
    if len(xy) > 1:
        dd = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
        dd[np.arange(len(xy)), np.arange(len(xy))] = 1e9
        assert dd.min() >= 8.0 - 1e-6


def test_detect_corners_masks_existing():
    img_np, pts = textured_image()
    img = jnp.asarray(img_np)
    exist = jnp.asarray(pts[:20])
    exist_valid = jnp.ones((20,), bool)
    xy, score, valid = detect_corners(
        img, 24, exist, exist_valid, mask_radius=10.0, min_distance=8.0,
        min_response=1e-4)
    xy = np.asarray(xy)[np.asarray(valid)]
    if len(xy):
        d = np.linalg.norm(xy[:, None, :] - pts[None, :20, :], axis=-1).min(axis=1)
        assert d.min() >= 10.0 - 1e-6


def test_lk_recovers_translation():
    img_np, pts = textured_image(h=160, w=200, seed=3)
    dx, dy = 3.3, -2.6
    cur_np = shift_image(img_np, dx, dy)
    params = LKParams(window_size=15, max_level=2, max_iter=20,
                      min_eig_threshold=1e-3)  # cv-unit threshold (MIN_EIG_CV_SCALE)
    prev_pyr, prev_grads = precompute_prev(jnp.asarray(img_np), params)
    cur_pyr = build_pyramid(jnp.asarray(cur_np), params.max_level)
    p0 = jnp.asarray(pts[(pts[:, 0] > 25) & (pts[:, 0] < 175) & (pts[:, 1] > 25) & (pts[:, 1] < 135)])
    new_pts, status, min_eig = lk_track_pyramid(prev_pyr, prev_grads, cur_pyr, p0, params=params)
    ok = np.asarray(status) == 0
    assert ok.sum() >= max(3, int(0.6 * len(np.asarray(p0))))
    flow = np.asarray(new_pts)[ok] - np.asarray(p0)[ok]
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=0.25)


def test_lk_initial_guess():
    img_np, pts = textured_image(h=160, w=200, seed=4)
    dx, dy = 9.0, 7.0  # large flow: needs the guess with a small window
    cur_np = shift_image(img_np, dx, dy)
    params = LKParams(window_size=9, max_level=0, max_iter=20,
                      min_eig_threshold=1e-3)
    prev_pyr, prev_grads = precompute_prev(jnp.asarray(img_np), params)
    cur_pyr = build_pyramid(jnp.asarray(cur_np), params.max_level)
    sel = (pts[:, 0] > 30) & (pts[:, 0] < 160) & (pts[:, 1] > 30) & (pts[:, 1] < 130)
    p0 = jnp.asarray(pts[sel])
    guess = p0 + jnp.asarray([dx - 0.8, dy + 0.7])
    new_pts, status, _ = lk_track_pyramid(
        prev_pyr, prev_grads, cur_pyr, p0, initial_pts=guess, params=params)
    ok = np.asarray(status) == 0
    flow = np.asarray(new_pts)[ok] - np.asarray(p0)[ok]
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=0.3)


def test_ransac2_pure_rotation_with_outliers():
    cam = build_pinhole(300.0, 300.0, 160.0, 120.0, width=320, height=240)
    rng = np.random.RandomState(5)
    T = 40
    # rays from random pixels
    pts1 = rng.rand(T, 2) * np.array([280, 200]) + 20
    from hybvio_tpu.geometry.cameras import pixel_to_ray, ray_to_pixel
    rays, _ = pixel_to_ray(cam, jnp.asarray(pts1))
    # small camera rotation
    ang = 0.03
    R_true = np.array([
        [np.cos(ang), -np.sin(ang), 0],
        [np.sin(ang), np.cos(ang), 0],
        [0, 0, 1.0]])
    rays2 = np.asarray(rays) @ R_true.T
    pts2, ok = ray_to_pixel(cam, jnp.asarray(rays2))
    pts2 = np.array(pts2)  # writable copy
    # inject outliers
    outliers = rng.rand(T) < 0.25
    pts2[outliers] += rng.randn(outliers.sum(), 2) * 40 + 15
    valid = np.ones(T, bool)

    res = ransac2(cam, cam, jnp.asarray(pts1), jnp.asarray(pts2),
                  jnp.asarray(valid), jax.random.PRNGKey(0), threshold_px=2.0)
    inl = np.asarray(res.inliers)
    assert inl[~outliers].mean() > 0.9  # keeps the true inliers
    assert inl[outliers].mean() < 0.2  # rejects the outliers
    # recovered rotation close to truth (note: solves p2 ~ R^T p1 convention check)
    err = min(np.abs(np.asarray(res.R) - R_true).max(),
              np.abs(np.asarray(res.R) - R_true.T).max())
    assert err < 0.01


def test_stereo_upright_2p():
    """Gravity-aligned 2-point pose RANSAC: recover yaw + translation."""
    from hybvio_tpu.frontend.ransac import stereo_upright_2p

    rng = np.random.RandomState(7)
    T = 30
    pts = np.stack([rng.randn(T) * 2, rng.randn(T) * 2, 4 + 2 * rng.rand(T)], axis=1)
    yaw_true = 0.15
    t_true = np.array([0.2, -0.1, 0.05])
    c, s = np.cos(yaw_true), np.sin(yaw_true)
    Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    cur = pts @ Rz.T + t_true
    rays = cur / np.linalg.norm(cur, axis=1, keepdims=True)
    # outliers
    out = rng.rand(T) < 0.2
    rays[out] += rng.randn(out.sum(), 3) * 0.2
    res = stereo_upright_2p(jnp.asarray(pts), jnp.asarray(rays),
                            jnp.ones(T, bool), jax.random.PRNGKey(1),
                            error_thresh=1e-5)
    assert abs(float(res.yaw) - yaw_true) % (2 * np.pi) < 0.01
    np.testing.assert_allclose(np.asarray(res.t), t_true, atol=0.02)
    inl = np.asarray(res.inliers)
    assert inl[~out].mean() > 0.9
    assert inl[out].mean() < 0.3


def test_horn_rotation_matches_svd_kabsch():
    """Horn quaternion rotation (QCP eigensolve) == SVD Kabsch oracle."""
    from scipy.spatial.transform import Rotation as Rot

    from hybvio_tpu.frontend.ransac import _kabsch, _kabsch_svd

    rng = np.random.RandomState(3)
    for _ in range(10):
        R_true = Rot.random(random_state=rng).as_matrix()
        a = rng.randn(8, 3)
        b = a @ R_true.T + rng.randn(8, 3) * 0.01
        w = jnp.ones(8)
        R1 = np.asarray(_kabsch(jnp.asarray(a), jnp.asarray(b), w))
        R2 = np.asarray(_kabsch_svd(jnp.asarray(a), jnp.asarray(b), w))
        np.testing.assert_allclose(R1, R2, atol=1e-6)
        np.testing.assert_allclose(R1 @ R1.T, np.eye(3), atol=1e-6)


def test_horn_rotation_adversarial_cases():
    """QCP eigensolve is robust where plain power iteration fails: optimal
    quaternions (near-)orthogonal to any fixed start vector, tiny rotations,
    180-degree rotations, small weights/scales, and 2-point minimal sets."""
    from scipy.spatial.transform import Rotation as Rot

    from hybvio_tpu.frontend.ransac import _kabsch, _kabsch_svd

    rng = np.random.RandomState(7)

    def cost(R, a, b, w):
        return float(np.sum(w[:, None] * (b - a @ np.asarray(R).T) ** 2))

    quats = [
        np.array([0.5, -0.5, 0.5, -0.5]),  # exactly orthogonal to ones
        np.array([0.5 + 1e-7, -0.5, 0.5, -0.5]),
        np.array([1.0, 0.0, 0.0, 0.0]),  # identity rotation
        np.array([1e-8, 1.0, 0.0, 0.0]),  # ~180 deg about x
        np.array([np.cos(1e-6), np.sin(1e-6), 0.0, 0.0]),  # tiny rotation
    ]
    for q in quats:
        q = q / np.linalg.norm(q)
        # scipy uses xyzw order
        R_true = Rot.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()
        for scale in (1.0, 1e-4, 1e4):
            a = rng.randn(8, 3) * scale
            b = a @ R_true.T
            w = jnp.ones(8)
            R1 = np.asarray(_kabsch(jnp.asarray(a), jnp.asarray(b), w))
            np.testing.assert_allclose(R1 @ R1.T, np.eye(3), atol=1e-6)
            np.testing.assert_allclose(R1, R_true, atol=1e-5)

    # 2-point minimal sets (unit rays, as RANSAC2 uses): the optimum may be
    # non-unique; require cost-equivalence with the SVD oracle + orthogonality
    for _ in range(20):
        a = rng.randn(2, 3)
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        R_true = Rot.random(random_state=rng).as_matrix()
        b = a @ R_true.T
        w = jnp.ones(2)
        R1 = np.asarray(_kabsch(jnp.asarray(a), jnp.asarray(b), w))
        R2 = np.asarray(_kabsch_svd(jnp.asarray(a), jnp.asarray(b), w))
        np.testing.assert_allclose(R1 @ R1.T, np.eye(3), atol=1e-6)
        assert cost(R1, a, b, np.ones(2)) <= cost(R2, a, b, np.ones(2)) + 1e-8

    # zero cross-covariance (no data): any rotation; must stay finite/orthogonal
    R0 = np.asarray(_kabsch(jnp.zeros((2, 3)), jnp.zeros((2, 3)), jnp.zeros(2)))
    np.testing.assert_allclose(R0 @ R0.T, np.eye(3), atol=1e-6)


def test_gftt_quality_level_gate():
    """gfttQualityLevel rejects candidates below quality*best response
    (reference: cv::GFTTDetector::setQualityLevel)."""
    import jax.numpy as jnp
    import numpy as np

    from hybvio_tpu.frontend.gftt import detect_corners

    rng = np.random.RandomState(0)
    img = rng.rand(96, 128).astype(np.float32) * 0.05
    # one strong corner + one weak corner
    for (cx, cy, amp) in ((30, 30, 1.0), (90, 60, 0.15)):
        img[cy - 2:cy + 3, cx - 2:cx + 3] += amp * np.array(
            [[0, 0, 0, 0, 0], [0, 1, 0, 1, 0], [0, 0, 0, 0, 0],
             [0, 1, 0, 1, 0], [0, 0, 0, 0, 0]], np.float32)
    none_xy = jnp.full((1, 2), -100.0)
    none_valid = jnp.zeros(1, bool)
    kw = dict(mask_radius=5.0, min_distance=10.0, min_response=1e-5)
    _, _, v_all = detect_corners(jnp.asarray(img), 8, none_xy, none_valid,
                                 quality_level=0.0, **kw)
    _, _, v_gated = detect_corners(jnp.asarray(img), 8, none_xy, none_valid,
                                   quality_level=0.5, **kw)
    assert int(v_gated.sum()) < int(v_all.sum())
    assert int(v_gated.sum()) >= 1  # the strong corner survives


def test_subpix_epsilon_early_stop_matches_full():
    """subPixEpsilon terminates refinement early without changing the
    converged corner (reference: cv::TermCriteria COUNT|EPS,
    subpixel_adjuster.cpp:31-33)."""
    import jax.numpy as jnp
    import numpy as np

    from hybvio_tpu.frontend.gftt import subpixel_refine

    rng = np.random.RandomState(1)
    img = rng.rand(64, 96).astype(np.float32) * 0.02
    # a bright diamond whose centroid sits at a known subpixel spot
    yy, xx = np.mgrid[0:64, 0:96]
    img += np.exp(-((xx - 40.3) ** 2 + (yy - 30.7) ** 2) / 4.0).astype(np.float32)
    xy0 = jnp.asarray([[39.0, 30.0]], jnp.float32)
    full = np.asarray(subpixel_refine(jnp.asarray(img), xy0, window=5,
                                      iters=10, epsilon=0.0))
    eps = np.asarray(subpixel_refine(jnp.asarray(img), xy0, window=5,
                                     iters=10, epsilon=1e-3))
    assert np.allclose(full, eps, atol=5e-3), (full, eps)
