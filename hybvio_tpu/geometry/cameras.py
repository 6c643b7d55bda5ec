"""Camera models: pinhole (radial k1-k3) and Kannala-Brandt fisheye (KB4).

TPU-native redesign of the reference camera classes (reference:
src/tracker/camera.cpp:88-467). Differences from the reference by design:

  * A single array-based ``Camera`` pytree replaces the virtual class
    hierarchy; the model kind is static metadata so that ``pixel_to_ray`` /
    ``ray_to_pixel`` trace to fixed-shape XLA programs and can be vmapped over
    pixel batches (the reference loops per pixel on CPU).
  * Iterative inversions (pinhole undistort, fisheye theta solve) run a fixed
    number of Newton iterations instead of while-loops with tolerances: fixed
    trip counts are required for efficient jit and the extra iterations are
    free on the VPU.
  * Projection Jacobians come from jax.jacfwd at call sites (the reference
    hand-derives them, camera.cpp:184-204, 374-407).

Functions return an explicit validity mask instead of a bool return.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PINHOLE = "pinhole"
FISHEYE = "fisheye"


@partial(jax.tree_util.register_dataclass, data_fields=["fx", "fy", "cx", "cy", "coeffs", "rot", "max_valid_theta", "max_valid_r"], meta_fields=["kind", "has_distortion", "has_rotation", "width", "height"])
@dataclasses.dataclass(frozen=True)
class Camera:
    """Array-based camera model (pytree; `kind` & flags are static metadata)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    coeffs: jnp.ndarray  # (4,): pinhole uses k1..k3 (last unused), fisheye k1..k4
    rot: jnp.ndarray  # (3,3) rectification rotation (identity if unused)
    max_valid_theta: jnp.ndarray  # fisheye FOV cutoff (radians from axis)
    max_valid_r: jnp.ndarray  # distort(max_valid_theta)
    kind: str = PINHOLE
    has_distortion: bool = False
    has_rotation: bool = False
    width: int = -1
    height: int = -1

    @property
    def focal_length(self):
        return 0.5 * (self.fx + self.fy)


def _poly_theta(theta, k):
    """KB4 distortion r(theta) = theta(1 + k1 t^2 + k2 t^4 + k3 t^6 + k4 t^8)."""
    t2 = theta * theta
    return theta * (1 + t2 * (k[0] + t2 * (k[1] + t2 * (k[2] + t2 * k[3]))))


def build_pinhole(fx, fy, cx, cy, coeffs=(), width=-1, height=-1, rotation=None, dtype=jnp.float64) -> Camera:
    c = np.zeros(4)
    coeffs = tuple(coeffs)
    has_dist = len(coeffs) > 1 or (len(coeffs) == 1 and coeffs[0] != 0.0)
    if has_dist:
        c[: len(coeffs)] = coeffs
    rot = np.eye(3) if rotation is None else np.asarray(rotation)
    has_rot = rotation is not None and np.linalg.norm(rot - np.eye(3)) > 1e-8
    a = lambda x: jnp.asarray(x, dtype=dtype)
    return Camera(
        fx=a(fx), fy=a(fy), cx=a(cx), cy=a(cy), coeffs=a(c), rot=a(rot),
        max_valid_theta=a(np.pi / 2), max_valid_r=a(np.inf),
        kind=PINHOLE, has_distortion=has_dist, has_rotation=has_rot,
        width=int(width), height=int(height),
    )


def build_fisheye(fx, fy, cx, cy, coeffs=(), max_valid_fov_deg=180.0,
                  width=-1, height=-1, dtype=jnp.float64) -> Camera:
    c = np.zeros(4)
    coeffs = tuple(coeffs)
    has_dist = len(coeffs) > 1
    if has_dist:
        assert len(coeffs) == 4, "KB4 fisheye needs 4 coefficients"
        c[:] = coeffs
    max_theta = 0.5 * max_valid_fov_deg * np.pi / 180.0
    t2 = max_theta * max_theta
    max_r = max_theta * (1 + t2 * (c[0] + t2 * (c[1] + t2 * (c[2] + t2 * c[3])))) if has_dist else max_theta
    a = lambda x: jnp.asarray(x, dtype=dtype)
    return Camera(
        fx=a(fx), fy=a(fy), cx=a(cx), cy=a(cy), coeffs=a(c), rot=a(np.eye(3)),
        max_valid_theta=a(max_theta), max_valid_r=a(max_r),
        kind=FISHEYE, has_distortion=has_dist, has_rotation=False,
        width=int(width), height=int(height),
    )


def with_intrinsics(cam: Camera, fx, fy=None, cx=None, cy=None, coeffs=None) -> Camera:
    """Same camera model with replaced intrinsics (per-frame varying lens).

    The returned Camera shares `cam`'s STATIC pytree structure (kind,
    distortion/rotation flags, width/height), so feeding it as a dynamic
    argument to a jitted step re-uses the compiled program — the TPU-native
    form of the reference's per-frame intrinsics ingestion
    (addFrameMonoVarying, src/api/internal.hpp:216-230; the JSONL reader's
    per-frame cameraParameters, src/commandline/input_jsonl.cpp:119-199).
    Distortion coefficients are replaced only when the base camera was built
    WITH distortion (the flag is static); otherwise they are ignored.
    """
    dt = cam.fx.dtype
    a = lambda x: jnp.asarray(x, dtype=dt)
    return dataclasses.replace(
        cam,
        fx=a(fx),
        fy=a(fy if fy is not None else fx),
        cx=a(cx) if cx is not None else cam.cx,
        cy=a(cy) if cy is not None else cam.cy,
        coeffs=(a(np.pad(np.asarray(coeffs, np.float64), (0, 4))[:4])
                if (coeffs is not None and cam.has_distortion) else cam.coeffs),
    )


def build_camera_from_params(pt, width: int, height: int, second: bool = False, dtype=jnp.float64) -> Camera:
    """Build from ParametersTracker with automatic fallbacks (reference:
    src/tracker/util.cpp automaticCameraParametersWhereUnset + buildCamera)."""
    if not second:
        fx = pt.focalLengthX if pt.focalLengthX > 0 else pt.focalLength
        fy = pt.focalLengthY if pt.focalLengthY > 0 else pt.focalLength
        cx, cy = pt.principalPointX, pt.principalPointY
        coeffs = pt.distortionCoeffs
    else:
        fx = pt.secondFocalLengthX if pt.secondFocalLengthX > 0 else (
            pt.secondFocalLength if pt.secondFocalLength > 0 else (pt.focalLengthX if pt.focalLengthX > 0 else pt.focalLength))
        fy = pt.secondFocalLengthY if pt.secondFocalLengthY > 0 else (
            pt.secondFocalLength if pt.secondFocalLength > 0 else (pt.focalLengthY if pt.focalLengthY > 0 else pt.focalLength))
        cx = pt.secondPrincipalPointX if pt.secondPrincipalPointX > 0 else pt.principalPointX
        cy = pt.secondPrincipalPointY if pt.secondPrincipalPointY > 0 else pt.principalPointY
        coeffs = pt.secondDistortionCoeffs if len(pt.secondDistortionCoeffs) > 1 else pt.distortionCoeffs
    if cx < 0:
        cx = 0.5 * width
    if cy < 0:
        cy = 0.5 * height
    if len(coeffs) == 1 and coeffs[0] == 0.0:
        coeffs = ()
    if pt.fisheyeCamera:
        return build_fisheye(fx, fy, cx, cy, coeffs, pt.validCameraFov,
                             width=width, height=height, dtype=dtype)
    return build_pinhole(fx, fy, cx, cy, coeffs, width, height, dtype=dtype)


# --- pinhole distortion ---

def _pinhole_distort(cam: Camera, xy):
    """OpenCV radial model with k1,k2,k3 (reference: camera.cpp:98-118)."""
    k = cam.coeffs
    r2 = jnp.sum(xy * xy, axis=-1, keepdims=True)
    theta = 1 + r2 * (k[0] + r2 * (k[1] + r2 * k[2]))
    return xy * theta


def _pinhole_undistort(cam: Camera, pt, iters: int = 20):
    """Newton inversion of the radial distortion (reference: camera.cpp:120-136).

    Uses the analytic 2x2 Jacobian of the distortion (batched closed-form
    inverse) so the solve vectorizes over arbitrary leading dimensions.
    """
    if not cam.has_distortion:
        return pt
    k = cam.coeffs

    def body(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        theta = 1 + r2 * (k[0] + r2 * (k[1] + r2 * k[2]))
        dtheta = k[0] + r2 * (2 * k[1] + 3 * r2 * k[2])  # d theta / d r^2
        a = theta + 2 * x * x * dtheta
        b = 2 * x * y * dtheta
        c = 2 * y * x * dtheta
        d = theta + 2 * y * y * dtheta
        det = a * d - b * c
        rx = pt[..., 0] - x * theta
        ry = pt[..., 1] - y * theta
        dx = (d * rx - b * ry) / det
        dy = (-c * rx + a * ry) / det
        return xy + jnp.stack([dx, dy], axis=-1)

    return jax.lax.fori_loop(0, iters, body, pt)


# --- fisheye theta solve ---

def _fisheye_undistort_theta(cam: Camera, r, iters: int = 12):
    """Newton solve of r = distort(theta) starting from theta=r
    (reference: camera.cpp:285-330 uses a LUT warm start + Newton; a fixed
    Newton iteration from r converges for all valid KB4 lenses and is
    branch-free)."""
    k = cam.coeffs

    def body(_, theta):
        t2 = theta * theta
        f = _poly_theta(theta, k) - r
        df = 1 + 3 * t2 * (k[0] + 5.0 / 3 * t2 * (k[1] + 7.0 / 5 * t2 * (k[2] + 9.0 / 7 * t2 * k[3])))
        return jnp.maximum(theta - f / df, 0.0)

    return jax.lax.fori_loop(0, iters, body, jnp.minimum(r, cam.max_valid_theta * 1.5))


# --- public API (shape-polymorphic over leading dims; pixel (...,2), ray (...,3)) ---

def pixel_to_ray(cam: Camera, pixel):
    """Unit ray for pixel; returns (ray, valid). (reference: camera.cpp pixelToRay)."""
    x = (pixel[..., 0] - cam.cx) / cam.fx
    y = (pixel[..., 1] - cam.cy) / cam.fy
    uv = jnp.stack([x, y], axis=-1)
    if cam.kind == PINHOLE:
        pt = _pinhole_undistort(cam, uv) if cam.has_distortion else uv
        ray = jnp.concatenate([pt, jnp.ones_like(pt[..., :1])], axis=-1)
        ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        if cam.has_rotation:
            ray = jnp.einsum("ij,...j->...i", cam.rot, ray)
        return ray, jnp.ones(pixel.shape[:-1], dtype=bool)
    # fisheye
    r = jnp.linalg.norm(uv, axis=-1)
    safe_r = jnp.where(r > 1e-12, r, 1.0)
    dir_xy = uv / safe_r[..., None]
    valid = r <= cam.max_valid_r
    theta = jnp.where(r > 1e-12, _fisheye_undistort_theta(cam, jnp.minimum(r, cam.max_valid_r)) if cam.has_distortion else jnp.minimum(r, cam.max_valid_r), 0.0)
    theta = jnp.where(valid, theta, cam.max_valid_theta)
    z = jnp.cos(theta)
    xy = jnp.sin(theta)[..., None] * dir_xy
    ray = jnp.concatenate([xy, z[..., None]], axis=-1)
    return ray, valid


def ray_to_pixel(cam: Camera, ray):
    """Project ray to pixel; returns (pixel, valid). (reference: camera.cpp rayToPixel)."""
    if cam.kind == PINHOLE:
        if cam.has_rotation:
            ray = jnp.einsum("ji,...j->...i", cam.rot, ray)
        z = ray[..., 2]
        valid = z > 0
        iz = 1.0 / jnp.where(valid, z, 1.0)
        xy = ray[..., :2] * iz[..., None]
        if cam.has_distortion:
            xy = _pinhole_distort(cam, xy)
        px = xy[..., 0] * cam.fx + cam.cx
        py = xy[..., 1] * cam.fy + cam.cy
        return jnp.stack([px, py], axis=-1), valid
    # fisheye equidistant projection
    z = ray[..., 2]
    nrm = jnp.linalg.norm(ray, axis=-1)
    cos_t = jnp.clip(z / jnp.where(nrm > 0, nrm, 1.0), -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    valid = (z > 0) & (theta <= cam.max_valid_theta)
    r = _poly_theta(theta, cam.coeffs) if cam.has_distortion else theta
    rxy = jnp.linalg.norm(ray[..., :2], axis=-1)
    dir_xy = ray[..., :2] / jnp.where(rxy > 1e-12, rxy, 1.0)[..., None]
    uv = r[..., None] * dir_xy
    px = uv[..., 0] * cam.fx + cam.cx
    py = uv[..., 1] * cam.fy + cam.cy
    return jnp.stack([px, py], axis=-1), valid


def normalize_pixel(cam: Camera, pixel):
    """Pixel -> normalized image coordinates ray.xy/ray.z; returns (norm, valid)
    (reference: camera.cpp:471-476)."""
    ray, valid = pixel_to_ray(cam, pixel)
    z = ray[..., 2]
    ok = valid & (z > 0)
    zz = jnp.where(ok, z, 1.0)
    return ray[..., :2] / zz[..., None], ok


def ray_to_pixel_jacobian(cam: Camera, ray):
    """(pixel, valid, d pixel / d ray) via autodiff; batched over leading dims."""

    def f(r):
        return ray_to_pixel(cam, r)[0]

    flat = ray.reshape(-1, 3)
    J = jax.vmap(jax.jacfwd(f))(flat).reshape(ray.shape[:-1] + (2, 3))
    pix, valid = ray_to_pixel(cam, ray)
    return pix, valid, J


def is_valid_pixel(cam: Camera, pixel):
    if cam.kind == PINHOLE:
        if cam.width < 0:
            return jnp.ones(pixel.shape[:-1], dtype=bool)
        x = jnp.round(pixel[..., 0])
        y = jnp.round(pixel[..., 1])
        return (x >= 0) & (x < cam.width) & (y >= 0) & (y < cam.height)
    _, valid = pixel_to_ray(cam, pixel)
    return valid
