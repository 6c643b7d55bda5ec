"""Stereo rectification and undistortion/rectification resampling.

Port of the reference rectifier + undistorter (reference:
src/tracker/stereo_rectifier.cpp, src/tracker/undistorter.cpp): compute a pair
of rectified pinhole cameras (carrying the rectification rotation, consumed by
the camera model like the reference's rotation support, camera.cpp:158-162),
the disparity-to-depth Q matrix re-rotated into unrectified cam0 coordinates,
and dense per-pixel remap fields evaluated as one vectorized
dst.pixel_to_ray -> src.ray_to_pixel pass (the reference's GLSL shader /
CPU double loop becomes a single fused XLA program).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.cameras import Camera, build_pinhole, pixel_to_ray, ray_to_pixel
from ..frontend.pyramid import bilinear_sample


def stereo_rectify(cam0: Camera, cam1: Camera, imu_to_cam0: np.ndarray,
                   imu_to_cam1: np.ndarray, width: int, height: int,
                   zoom: float = 1.0, dtype=jnp.float32):
    """Compute rectified cameras + Q matrix (reference: StereoRectifier::build).

    The relative extrinsic is cam0->cam1 = imu_to_cam1 @ imu_to_cam0^-1
    (reference: stereo_rectifier.cpp:51-65). Returns (rect_cam0, rect_cam1,
    Q (4,4) disparity->depth in UNRECTIFIED cam0 coords, R_rect0, R_rect1).
    """
    T01 = np.asarray(imu_to_cam1) @ np.linalg.inv(np.asarray(imu_to_cam0))
    R = T01[:3, :3]  # cam0 -> cam1 rotation
    t = T01[:3, 3]  # cam1 origin in... x_cam1 = R x_cam0 + t

    # split the relative rotation evenly (like cv::stereoRectify)
    from scipy.spatial.transform import Rotation as Rot

    r_half = Rot.from_matrix(R)
    rotvec = r_half.as_rotvec()
    R_half0 = Rot.from_rotvec(-rotvec / 2).as_matrix()  # applied to cam0
    R_half1 = Rot.from_rotvec(rotvec / 2).as_matrix()   # cam1 = R (R_half0^T ...)

    # baseline in the half-rotated frame; new x axis along the baseline
    t_half = R_half1 @ t
    e1 = -t_half / np.linalg.norm(t_half)
    if e1[0] < 0:
        e1 = -e1  # keep x roughly rightward
    e2 = np.cross(np.array([0.0, 0.0, 1.0]), e1)
    e2 /= np.linalg.norm(e2)
    e3 = np.cross(e1, e2)
    R_align = np.stack([e1, e2, e3], axis=0)  # new-cam-from-half frame

    # rectification rotations: rectified ray = R_rect @ original camera ray
    R_rect0 = R_align @ R_half0
    R_rect1 = R_align @ R_half1

    f = float(np.asarray(cam0.fx) + np.asarray(cam0.fy)) * 0.5 * zoom
    cx, cy = width / 2.0, height / 2.0
    # rectified cameras carry rotation^T: Camera.rot maps camera ray -> world-ish
    # convention of cameras.py: pixel_to_ray applies rot, ray_to_pixel applies rot^T
    rc0 = build_pinhole(f, f, cx, cy, width=width, height=height,
                        rotation=R_rect0.T, dtype=dtype)
    rc1 = build_pinhole(f, f, cx, cy, width=width, height=height,
                        rotation=R_rect1.T, dtype=dtype)

    baseline = float(np.linalg.norm(t))
    # Q: [x y disp 1] -> homogeneous 3D in RECTIFIED cam0 coords
    Q_rect = np.array([
        [1.0, 0.0, 0.0, -cx],
        [0.0, 1.0, 0.0, -cy],
        [0.0, 0.0, 0.0, f],
        [0.0, 0.0, 1.0 / baseline, 0.0],
    ])
    # re-rotate into unrectified cam0 coords (reference: stereo_rectifier.cpp:86-93)
    R4 = np.eye(4)
    R4[:3, :3] = R_rect0.T
    Q = R4 @ Q_rect
    return rc0, rc1, jnp.asarray(Q, dtype), R_rect0, R_rect1


def build_remap(src_cam: Camera, dst_cam: Camera, width: int, height: int):
    """(H, W, 2) map: for each DST pixel, the SRC pixel to sample
    (reference: Undistorter shader, undistorter.cpp:16-41, 75-111)."""
    ys, xs = jnp.mgrid[0:height, 0:width]
    pix = jnp.stack([xs, ys], axis=-1).astype(src_cam.fx.dtype)
    rays, ok1 = pixel_to_ray(dst_cam, pix)
    src_pix, ok2 = ray_to_pixel(src_cam, rays)
    ok = ok1 & ok2
    # out-of-range dst pixels sample (-10,-10) -> clamped dark border
    return jnp.where(ok[..., None], src_pix, -10.0)


def remap(image: jnp.ndarray, mapping: jnp.ndarray) -> jnp.ndarray:
    """Bilinear resample image at mapping (H, W, 2)."""
    return bilinear_sample(image, mapping)


def build_mono_undistort(cam: Camera, width: int, height: int, zoom: float = 1.0,
                         dtype=jnp.float32):
    """Mono undistortion target: centered-principal-point pinhole
    (reference: Undistorter::buildMono, undistorter.cpp:150-168)."""
    f = float(np.asarray(cam.fx) + np.asarray(cam.fy)) * 0.5 * zoom
    target = build_pinhole(f, f, width / 2, height / 2, width=width,
                           height=height, dtype=dtype)
    return target, build_remap(cam, target, width, height)
