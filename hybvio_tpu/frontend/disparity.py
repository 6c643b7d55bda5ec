"""Dense stereo disparity (block matching) + depth, TPU-native.

Port of the reference StereoBM usage (reference: src/tracker/
stereo_disparity.cpp): SAD block matching over a rectified pair with max
disparity ~10% of width rounded to 32 (stereo_disparity.cpp:39), a
uniqueness/speckle-like validity filter, and Q-matrix reprojection for
per-pixel depth and a strided point cloud.

Redesign: instead of the CPU's per-pixel loop, the whole cost volume
(D, H, W) is built from D shifted image differences + a separable box filter,
and the argmin reduces on the VPU -- one fused XLA program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .pyramid import box_filter


def default_max_disparity(width: int) -> int:
    """(reference: stereo_disparity.cpp:39: 10% of width rounded to 32)"""
    return max(32, int(round(width * 0.1 / 32.0)) * 32)


def compute_disparity(left: jnp.ndarray, right: jnp.ndarray, max_disparity: int,
                      block_size: int = 15, uniqueness: float = 0.97):
    """SAD block-matching disparity of the rectified pair.

    Convention: a point at left x appears at right x - d (cameras side by
    side, left = cam0). Returns (disparity (H, W) float, valid (H, W) bool).
    """
    H, W = left.shape
    dtype = left.dtype

    def cost_at(d):
        shifted = jnp.roll(right, d, axis=1)
        # invalidate wrapped columns
        col = jnp.arange(W)
        bad = col < d
        diff = jnp.abs(left - shifted)
        diff = jnp.where(bad[None, :], 1e3, diff)
        return box_filter(diff, block_size)

    costs = jax.vmap(cost_at)(jnp.arange(max_disparity))  # (D, H, W)
    best = jnp.argmin(costs, axis=0)
    cmin = jnp.min(costs, axis=0)
    # uniqueness check: best must beat the second-best (outside +-1) clearly
    D = max_disparity
    dgrid = jnp.arange(D)[:, None, None]
    nearby = jnp.abs(dgrid - best[None]) <= 1
    costs2 = jnp.where(nearby, jnp.inf, costs)
    c2 = jnp.min(costs2, axis=0)
    valid = (cmin <= uniqueness * c2) & (best > 0) & (best < D - 1)

    # parabola subpixel refinement around the winner
    idx = jnp.clip(best, 1, D - 2)
    hgrid, wgrid = jnp.mgrid[0:H, 0:W]
    c_m = costs[idx - 1, hgrid, wgrid]
    c_0 = costs[idx, hgrid, wgrid]
    c_p = costs[idx + 1, hgrid, wgrid]
    denom = jnp.maximum(c_m - 2 * c_0 + c_p, 1e-9)
    delta = jnp.clip(0.5 * (c_m - c_p) / denom, -0.5, 0.5)
    disp = best.astype(dtype) + delta
    return disp, valid


def disparity_to_depth(disp: jnp.ndarray, valid: jnp.ndarray, Q: jnp.ndarray):
    """Per-pixel depth via the Q matrix (reference: getDepth,
    stereo_disparity.cpp:66-77). Returns (depth (H, W), valid)."""
    H, W = disp.shape
    ys, xs = jnp.mgrid[0:H, 0:W]
    v = jnp.stack([xs.astype(disp.dtype), ys.astype(disp.dtype), disp,
                   jnp.ones_like(disp)], axis=-1)
    p = jnp.einsum("ij,hwj->hwi", Q, v)
    w = p[..., 3]
    ok = valid & (jnp.abs(w) > 1e-9)
    depth = jnp.where(ok, p[..., 2] / jnp.where(ok, w, 1.0), -1.0)
    return depth, ok & (depth > 0)


def point_cloud(disp: jnp.ndarray, valid: jnp.ndarray, Q: jnp.ndarray,
                stride: int = 5):
    """Strided 3D point cloud in cam0 coords (reference: computePointCloud,
    stereo_disparity.cpp:79-94). Returns (points (N,3), ok (N,))."""
    H, W = disp.shape
    ys, xs = jnp.mgrid[0:H:stride, 0:W:stride]
    d = disp[::stride, ::stride]
    ok = valid[::stride, ::stride]
    v = jnp.stack([xs.astype(disp.dtype), ys.astype(disp.dtype), d,
                   jnp.ones_like(d)], axis=-1)
    p = jnp.einsum("ij,hwj->hwi", Q, v)
    w = p[..., 3:4]
    pts = p[..., :3] / jnp.where(jnp.abs(w) > 1e-9, w, 1.0)
    return pts.reshape(-1, 3), (ok & (pts[..., 2] > 0)).reshape(-1)


def sample_depth(depth: jnp.ndarray, valid: jnp.ndarray, xy: jnp.ndarray):
    """Depth at (sub)pixel positions (nearest), -1 where invalid
    (reference: Tracker::computeDenseStereoDepth attaching track depths)."""
    H, W = depth.shape
    x = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32), 0, H - 1)
    d = depth[y, x]
    ok = valid[y, x]
    return jnp.where(ok, d, -1.0)
