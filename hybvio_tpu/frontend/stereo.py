"""Stereo front-end pieces: left->right matching and the epipolar-curve check.

Port of the reference stereo tracking (reference: tracker.cpp:82-154, 348-376,
409-463): the right-camera feature positions come from LK between the current
left and right images (or independent right-to-right flow), and matches are
validated against an 8-point epipolar curve traced through both (possibly
distorted) camera models -- a generalization of the epipolar line that works
for fisheye lenses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.cameras import Camera, pixel_to_ray, ray_to_pixel
from ..geometry.poses import transform_vec3

CURVE_POINTS = 8


def epipolar_curves(cam0: Camera, cam1: Camera, pts0, cam0_to_cam1):
    """Trace the epipolar curve of each left pixel into the right camera
    (reference: computeEpipolarCurve): project the left ray at depths
    0.5 * 2^j, j = 0..7. Returns (curves (T, 8, 2), curve_valid (T, 8))."""
    ray0, ok0 = pixel_to_ray(cam0, pts0)  # (T,3)
    scales = 0.5 * 2.0 ** jnp.arange(CURVE_POINTS, dtype=pts0.dtype)  # (8,)
    r0 = ray0[:, None, :] * scales[None, :, None]  # (T,8,3)
    r1 = transform_vec3(cam0_to_cam1, r0)
    pix, ok = ray_to_pixel(cam1, r1)
    return pix, ok & ok0[:, None]


def within_curve_distance(point, curve, curve_valid, dist):
    """Min distance of `point` to the polyline `curve` <= dist
    (reference: withinDistanceFromCurve: vertex distances + segment
    projections)."""
    d2 = dist * dist
    dv = jnp.sum((curve - point[None, :]) ** 2, axis=-1)
    near_vertex = jnp.any(curve_valid & (dv < d2))
    c0 = curve[:-1]
    c1 = curve[1:]
    seg_ok = curve_valid[:-1] & curve_valid[1:]
    seg = c1 - c0
    s2 = jnp.sum(seg * seg, axis=-1)
    t = jnp.sum((point[None, :] - c0) * seg, axis=-1) / jnp.maximum(s2, 1e-12)
    proj = c0 + t[:, None] * seg
    dp = jnp.sum((point[None, :] - proj) ** 2, axis=-1)
    near_seg = jnp.any(seg_ok & (t > 0) & (t < 1) & (dp < d2))
    return near_vertex | near_seg


def epipolar_check(cam0: Camera, cam1: Camera, pts0, pts1, valid, cam0_to_cam1,
                   max_dist_px):
    """(T,) bool: right points consistent with the left points' epipolar
    curves (reference: markCornersFailedByEpipolarConstraint)."""
    curves, curve_valid = epipolar_curves(cam0, cam1, pts0, cam0_to_cam1)
    ok = jax.vmap(within_curve_distance, in_axes=(0, 0, 0, None))(
        pts1, curves, curve_valid, jnp.asarray(max_dist_px, pts0.dtype))
    return jnp.where(valid, ok, False)
