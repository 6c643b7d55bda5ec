"""On-device (jitted) renderer for the synthetic blob-world bench sequences.

The numpy renderer (io/synthetic.py render_view / render_view_fisheye) costs
~240 ms/frame at 752x480 on the host — fine for tests, but the benchmark
renders hundreds of frames (and the seed-diverse lane renders B=16 distinct
worlds per step), which made the round-4 driver bench overrun its timeout.
This module renders the SAME world model (sky-sphere procedural background +
subpixel Gaussian landmark blobs, io/synthetic.py:263-325) as one fused XLA
program per frame, vmappable over lanes, with frames staying device-resident
(no host render, no H2D upload).

Reference analogue: the reference consumes pre-recorded video
(/root/reference/src/commandline/video_input.cpp); our synthetic protocol
generates data, so generation itself must not dominate the measured pipeline.
"""
from __future__ import annotations

import numpy as np

from .synthetic import _SKY_A, _SKY_K, _SKY_PH


def _ray_grid_pinhole(fx, fy, cx, cy, W, H):
    yy, xx = np.mgrid[0:H, 0:W]
    u = (xx - cx) / fx
    v = (yy - cy) / fy
    rays = np.stack([u, v, np.ones_like(u)], axis=-1)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    return rays.astype(np.float32)


def _ray_grid_kb4(fx, fy, cx, cy, W, H, coeffs):
    """Camera-frame ray directions of the pixel grid under the KB4 model
    (numpy Newton inversion — constant per camera, computed once at setup;
    same math as io/synthetic.py render_view_fisheye:368-382)."""
    yy, xx = np.mgrid[0:H, 0:W]
    u = (xx - cx) / fx
    v = (yy - cy) / fy
    rr = np.sqrt(u * u + v * v)
    k1, k2, k3, k4 = (list(coeffs) + [0.0] * 4)[:4]
    theta = rr.copy()
    for _ in range(6):
        t2 = theta * theta
        f = theta * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - rr
        df = 1 + 3 * t2 * (k1 + 5 / 3 * t2 * (k2 + 7 / 5 * t2 * (
            k3 + 9 / 7 * t2 * k4)))
        theta = np.maximum(theta - f / df, 0.0)
    safe_rr = np.maximum(rr, 1e-12)
    rays = np.stack([np.sin(theta) * u / safe_rr,
                     np.sin(theta) * v / safe_rr, np.cos(theta)], axis=-1)
    return rays.astype(np.float32)


def make_blob_renderer(imu_to_cameras, fx, fy, cx, cy, W, H, blob_sigma=1.4,
                       fisheye_coeffs=None, max_fov_deg=160.0):
    """Build a jitted render(landmarks (N,3), pos (3,), quat (4,)) ->
    (C, H, W) float32 frame stack, one image per camera in `imu_to_cameras`.

    Matches io/synthetic.py render_view (pinhole) / render_view_fisheye (KB4)
    within float32: sky-sphere background + additive subpixel Gaussian blobs
    with the same deterministic per-landmark contrast (amp 0.6 / -0.22 by
    landmark parity) and the same 5-pixel visibility margin.

    vmap over (landmarks, pos, quat) for per-lane distinct worlds.
    """
    import jax
    import jax.numpy as jnp

    i2cs = np.stack([np.asarray(m, np.float32) for m in imu_to_cameras])
    C = i2cs.shape[0]
    if fisheye_coeffs is not None:
        grid = np.stack([_ray_grid_kb4(fx, fy, cx, cy, W, H, fisheye_coeffs)
                         for _ in range(C)])
        max_theta = np.deg2rad(max_fov_deg / 2.0)
    else:
        grid = np.stack([_ray_grid_pinhole(fx, fy, cx, cy, W, H)
                         for _ in range(C)])
        max_theta = None
    sky_k = jnp.asarray(_SKY_K, jnp.float32)
    sky_ph = jnp.asarray(_SKY_PH, jnp.float32)
    sky_a = jnp.asarray(_SKY_A, jnp.float32)
    grid = jnp.asarray(grid)  # (C, H, W, 3)
    i2cs_j = jnp.asarray(i2cs)
    r = int(np.ceil(3 * blob_sigma))
    d = jnp.arange(-r, r + 1)

    def quat_to_rmat(q):
        w, x, y, z = q[0], q[1], q[2], q[3]
        return jnp.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ], jnp.float32)

    def project_pinhole(pc):
        z = pc[:, 2]
        safe_z = jnp.where(jnp.abs(z) > 1e-9, z, 1.0)
        u = fx * pc[:, 0] / safe_z + cx
        v = fy * pc[:, 1] / safe_z + cy
        vis = (z > 0.3) & (u >= 5) & (u < W - 5) & (v >= 5) & (v < H - 5)
        return jnp.stack([u, v], axis=1), vis

    def project_kb4(pc):
        k1, k2, k3, k4 = (list(fisheye_coeffs) + [0.0] * 4)[:4]
        z = pc[:, 2]
        nrm = jnp.linalg.norm(pc, axis=1)
        cos_t = jnp.clip(z / jnp.maximum(nrm, 1e-12), -1, 1)
        theta = jnp.arccos(cos_t)
        t2 = theta * theta
        rad = theta * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
        rxy = jnp.linalg.norm(pc[:, :2], axis=1)
        dxy = pc[:, :2] / jnp.maximum(rxy, 1e-12)[:, None]
        u = rad * dxy[:, 0] * fx + cx
        v = rad * dxy[:, 1] * fy + cy
        vis = ((z > 0.3) & (theta <= max_theta)
               & (u >= 5) & (u < W - 5) & (v >= 5) & (v < H - 5))
        return jnp.stack([u, v], axis=1), vis

    def render_one_cam(ci, landmarks, pos, quat):
        R = quat_to_rmat(quat)
        i2c = i2cs_j[ci]
        w2c = i2c[:3, :3] @ R
        t = i2c[:3, :3] @ (-R @ pos) + i2c[:3, 3]
        pc = landmarks @ w2c.T + t
        if fisheye_coeffs is not None:
            pix, vis = project_kb4(pc)
        else:
            pix, vis = project_pinhole(pc)
        # sky background: procedural texture on world ray directions
        world_rays = grid[ci] @ w2c  # (H, W, 3)
        phase = world_rays @ sky_k.T + sky_ph
        img = 0.35 + jnp.sin(phase) @ sky_a * 0.25
        # blobs: scatter-add 11x11 subpixel Gaussian patches; invisible
        # landmarks get an off-image sentinel so their (amp=0) patches drop
        pix = jnp.where(vis[:, None], pix, 1.0e5)
        iu = jnp.round(pix[:, 0]).astype(jnp.int32)
        iv = jnp.round(pix[:, 1]).astype(jnp.int32)
        xs = iu[:, None] + d[None, :]
        ys = iv[:, None] + d[None, :]
        gx = xs.astype(jnp.float32) - pix[:, 0:1]
        gy = ys.astype(jnp.float32) - pix[:, 1:2]
        g = jnp.exp(-(gy[:, :, None] ** 2 + gx[:, None, :] ** 2)
                    / (2 * blob_sigma ** 2))
        n = landmarks.shape[0]
        amp = jnp.where(jnp.arange(n) % 2 == 0, 0.6, -0.22)
        amp = amp * vis.astype(jnp.float32)
        vals = amp[:, None, None] * g
        img = img.at[ys[:, :, None], xs[:, None, :]].add(vals, mode="drop")
        return jnp.clip(img, 0.0, 1.0)

    def render(landmarks, pos, quat):
        landmarks = landmarks.astype(jnp.float32)
        pos = pos.astype(jnp.float32)
        quat = quat.astype(jnp.float32)
        return jnp.stack([render_one_cam(ci, landmarks, pos, quat)
                          for ci in range(C)])

    return jax.jit(render)
