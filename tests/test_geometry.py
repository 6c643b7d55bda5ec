"""Geometry tests: quaternion goldens + camera round trips / Jacobians.

Ports the reference test strategy (reference: test/util.cpp, test/camera.cpp):
golden values, closed-loop property checks, and analytic-vs-numeric Jacobians
(here: our closed forms vs jax autodiff).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybvio_tpu.geometry import (
    quat_to_rmat, rmat_to_quat, quat_mul, quat_normalize, quat_from_two_vectors,
    gyro_update_matrix, quat_right_mul_matrix,
    build_pinhole, build_fisheye, pixel_to_ray, ray_to_pixel, normalize_pixel,
    ray_to_pixel_jacobian,
    to_world_to_camera, to_camera_to_world, transform_vec3, vec2matrix,
)


def test_quat_to_rmat_golden():
    # golden: rotation of 90 degrees about z
    q = jnp.array([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
    R = quat_to_rmat(q)
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(np.asarray(R), expected, atol=1e-12)


def test_quat_rmat_round_trip():
    rng = np.random.RandomState(0)
    q = rng.randn(50, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1
    R = quat_to_rmat(jnp.asarray(q))
    q2 = rmat_to_quat(R)
    np.testing.assert_allclose(np.asarray(q2), q, atol=1e-9)


def test_quat_mul_matches_rmat_compose():
    rng = np.random.RandomState(1)
    a = quat_normalize(jnp.asarray(rng.randn(4)))
    b = quat_normalize(jnp.asarray(rng.randn(4)))
    np.testing.assert_allclose(
        np.asarray(quat_to_rmat(quat_mul(a, b))),
        np.asarray(quat_to_rmat(a) @ quat_to_rmat(b)),
        atol=1e-12,
    )


def test_quat_right_mul_matrix():
    rng = np.random.RandomState(2)
    q = quat_normalize(jnp.asarray(rng.randn(4)))
    p = quat_normalize(jnp.asarray(rng.randn(4)))
    np.testing.assert_allclose(
        np.asarray(quat_right_mul_matrix(p) @ q), np.asarray(quat_mul(q, p)), atol=1e-12
    )


def test_from_two_vectors():
    u = jnp.array([0.0, 0.0, 9.81])
    v = jnp.array([1.0, 2.0, 5.0])
    q = quat_from_two_vectors(u, v)
    Rt = quat_to_rmat(q)
    got = Rt @ (u / jnp.linalg.norm(u)) * jnp.linalg.norm(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(v), atol=1e-9)
    # z-axis source: last quaternion component must be 0 (fixes heading;
    # reference relies on this, ekf.cpp:305-312)
    assert abs(float(q[3])) < 1e-12


def test_gyro_update_matrix_matches_expm():
    from scipy.linalg import expm  # scipy available via jax deps? fall back if not

    w = np.array([0.3, -0.2, 0.9])
    dt = 0.005
    S = np.array([
        [0, -w[0], -w[1], -w[2]],
        [w[0], 0, -w[2], w[1]],
        [w[1], w[2], 0, -w[0]],
        [w[2], -w[1], w[0], 0],
    ])
    expected = expm(-dt / 2 * S)
    got = np.asarray(gyro_update_matrix(jnp.asarray(w), dt))
    np.testing.assert_allclose(got, expected, atol=1e-12)
    # zero rate -> identity, and differentiable there
    got0 = np.asarray(gyro_update_matrix(jnp.zeros(3), dt))
    np.testing.assert_allclose(got0, np.eye(4), atol=1e-15)
    g = jax.jacfwd(lambda ww: gyro_update_matrix(ww, dt))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


# --- cameras ---

# RealSense-like pinhole + radial (reference: test/camera.cpp uses real coeffs)
PINHOLE = dict(fx=458.654, fy=457.296, cx=367.215, cy=248.375,
               coeffs=(-0.28340811, 0.07395907, 0.0), width=752, height=480)
# TUM-VI-like KB4 fisheye
FISHEYE = dict(fx=190.97847715128717, fy=190.9733070521226,
               cx=254.93170605935475, cy=256.8974428996504,
               coeffs=(0.0034823894022493434, 0.0007150348452162257,
                       -0.0020532361418706202, 0.00020293673591811182))


@pytest.mark.parametrize("make", [
    lambda: build_pinhole(**PINHOLE),
    lambda: build_fisheye(**FISHEYE, max_valid_fov_deg=150.0),
    lambda: build_pinhole(400.0, 400.0, 320.0, 240.0),
])
def test_camera_round_trip(make):
    cam = make()
    rng = np.random.RandomState(3)
    pix = jnp.asarray(rng.rand(100, 2) * np.array([500, 400]) + 5.0)
    ray, valid = pixel_to_ray(cam, pix)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(ray, axis=-1)), 1.0, atol=1e-9)
    pix2, valid2 = ray_to_pixel(cam, ray)
    v = np.asarray(valid & valid2)
    assert v.sum() > 50
    np.testing.assert_allclose(np.asarray(pix2)[v], np.asarray(pix)[v], atol=1e-4)


def test_fisheye_fov_cutoff():
    cam = build_fisheye(**FISHEYE, max_valid_fov_deg=150.0)
    # ray at 80 degrees from axis > 75 deg half-FOV must be invalid
    theta = np.deg2rad(80.0)
    ray = jnp.array([np.sin(theta), 0.0, np.cos(theta)])
    _, valid = ray_to_pixel(cam, ray)
    assert not bool(valid)


def test_projection_jacobian_vs_numeric():
    cam = build_pinhole(**PINHOLE)
    ray = jnp.array([[0.21, -0.13, 0.97], [0.0, 0.0, 1.0]])
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    pix, valid, J = ray_to_pixel_jacobian(cam, ray)
    eps = 1e-6
    for k in range(2):
        num = np.zeros((2, 3))
        for i in range(3):
            d = np.zeros(3)
            d[i] = eps
            pp, _ = ray_to_pixel(cam, ray[k] + d)
            pm, _ = ray_to_pixel(cam, ray[k] - d)
            num[:, i] = np.asarray(pp - pm) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[k]), num, rtol=1e-4, atol=1e-4)


def test_normalize_pixel():
    cam = build_pinhole(400.0, 400.0, 320.0, 240.0)
    n, ok = normalize_pixel(cam, jnp.array([320.0, 240.0]))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(n), [0.0, 0.0], atol=1e-12)


def test_pose_round_trip():
    rng = np.random.RandomState(4)
    p = jnp.asarray(rng.randn(3))
    q = quat_normalize(jnp.asarray(rng.randn(4)))
    i2c = vec2matrix((1, 0, 0, 0, -1, 0, 0, 0, -1))
    w2c = to_world_to_camera(p, q, i2c)
    c2w = to_camera_to_world(p, q, i2c)
    np.testing.assert_allclose(np.asarray(w2c @ c2w), np.eye(4), atol=1e-9)
    # camera center in world = transform of origin by c2w
    center = transform_vec3(c2w, jnp.zeros(3))
    # must satisfy w2c @ center = 0
    np.testing.assert_allclose(np.asarray(transform_vec3(w2c, center)), 0.0, atol=1e-9)
