"""Pyramidal Lucas-Kanade optical flow, TPU-native.

Port of cv::calcOpticalFlowPyrLK as used by the reference (reference:
src/tracker/optical_flow.cpp:10-58): coarse-to-fine over a Gaussian pyramid,
per-feature iterative LK with Scharr template gradients, a fixed window
(pyrLKWindowSize), fixed iteration count (pyrLKMaxIter; the epsilon early-exit
becomes a convergence freeze so the trip count stays static), minimum
eigenvalue check (pyrLKMinEigThreshold), optional initial-guess flow
(OPTFLOW_USE_INITIAL_FLOW), and out-of-range status.

vmapped over features; window sampling is bilinear gathers (a Pallas kernel
can later stage per-feature windows through VMEM explicitly).
"""
from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pyramid import bilinear_sample, build_pyramid, scharr_gradients

FLOW_OK = 0
FLOW_FAILED = 1
FLOW_OUT_OF_RANGE = 2


class LKParams(NamedTuple):
    window_size: int = 31
    max_level: int = 3
    max_iter: int = 20
    epsilon: float = 0.03
    min_eig_threshold: float = 1e-3


def _window_offsets(window_size: int, dtype):
    r = window_size // 2
    ax = jnp.arange(-r, r + 1, dtype=dtype)
    ox, oy = jnp.meshgrid(ax, ax, indexing="xy")
    return jnp.stack([ox, oy], axis=-1).reshape(-1, 2)  # (w*w, 2)


def lk_track_level(
    prev_img, prev_ix, prev_iy, cur_img, prev_pts, guesses, params: LKParams
):
    """One pyramid level of LK for all features.

    prev_pts, guesses: (N, 2) at THIS level's scale. Returns (new_pts (N,2),
    ok (N,), min_eig (N,)).
    """
    dtype = prev_img.dtype
    offs = _window_offsets(params.window_size, dtype)  # (K,2)
    H, W = prev_img.shape
    r = params.window_size // 2

    def one(p0, g0):
        pts = p0[None, :] + offs  # (K,2)
        t = bilinear_sample(prev_img, pts)
        ix = bilinear_sample(prev_ix, pts)
        iy = bilinear_sample(prev_iy, pts)
        gxx = jnp.sum(ix * ix)
        gyy = jnp.sum(iy * iy)
        gxy = jnp.sum(ix * iy)
        n = offs.shape[0]
        tr2 = 0.5 * (gxx + gyy) / n
        det = (gxx * gyy - gxy * gxy) / (n * n)
        min_eig = tr2 - jnp.sqrt(jnp.maximum(tr2 * tr2 - det, 0.0))
        det_g = gxx * gyy - gxy * gxy
        ok_g = det_g > 1e-12
        safe_det = jnp.where(ok_g, det_g, 1.0)

        def body(_, carry):
            q, done = carry
            w = bilinear_sample(cur_img, q[None, :] + offs)
            di = w - t
            bx = jnp.sum(di * ix)
            by = jnp.sum(di * iy)
            dx = (gyy * bx - gxy * by) / safe_det
            dy = (-gxy * bx + gxx * by) / safe_det
            delta = jnp.stack([dx, dy])
            converged = jnp.linalg.norm(delta) < params.epsilon
            q_new = jnp.where(done, q, q - delta)
            return (q_new, done | converged)

        q, _ = jax.lax.fori_loop(0, params.max_iter, body, (g0, ~ok_g))
        in_bounds = (
            (q[0] >= r) & (q[0] < W - r) & (q[1] >= r) & (q[1] < H - r)
            & (p0[0] >= r) & (p0[0] < W - r) & (p0[1] >= r) & (p0[1] < H - r)
        )
        # appearance residual at the converged position: protects against the
        # LK failure mode where a feature drifts onto low-texture background
        # and freezes at the initial guess (cv::calcOpticalFlowPyrLK has no
        # such check; the reference relies on downstream RANSAC, but a frozen
        # *set* of points forms a false consensus there)
        w_final = bilinear_sample(cur_img, q[None, :] + offs)
        resid = jnp.mean(jnp.abs(w_final - t))
        contrast = jnp.maximum(jnp.max(t) - jnp.min(t), 1e-6)
        ok_resid = resid <= jnp.maximum(0.25 * contrast, 0.02)
        return q, ok_g & in_bounds & ok_resid, min_eig

    return jax.vmap(one)(prev_pts, guesses)


def lk_track_pyramid(
    prev_pyr: List[jnp.ndarray],
    prev_grads: List[Tuple[jnp.ndarray, jnp.ndarray]],
    cur_pyr: List[jnp.ndarray],
    prev_pts: jnp.ndarray,
    initial_pts=None,
    params: LKParams = LKParams(),
):
    """Full pyramidal LK.

    prev_pts: (N, 2) level-0 pixel positions. initial_pts: optional (N, 2)
    initial guesses at level 0 (reference: OPTFLOW_USE_INITIAL_FLOW via the
    odometry flow predictor). Returns (pts (N,2), status (N,) int32, min_eig).
    """
    L = params.max_level
    scale_top = 2.0 ** L
    p_top = prev_pts / scale_top
    if initial_pts is None:
        g = p_top
    else:
        g = initial_pts / scale_top

    ok_all = jnp.ones(prev_pts.shape[0], bool)
    min_eig = jnp.zeros(prev_pts.shape[0], prev_pyr[0].dtype)
    for lvl in range(L, -1, -1):
        scale = 2.0 ** lvl
        p_lvl = prev_pts / scale
        new_pts, ok, min_eig = lk_track_level(
            prev_pyr[lvl], prev_grads[lvl][0], prev_grads[lvl][1],
            cur_pyr[lvl], p_lvl, g, params)
        ok_all = ok_all & ok
        if lvl > 0:
            g = new_pts * 2.0
        else:
            g = new_pts

    # final eigenvalue check at level 0 (OpenCV normalizes by window area)
    ok_all = ok_all & (min_eig >= params.min_eig_threshold)
    H, W = cur_pyr[0].shape
    x, y = g[:, 0], g[:, 1]
    in_range = (x >= 0) & (x < W) & (y >= 0) & (y < H)
    status = jnp.where(
        ~in_range, FLOW_OUT_OF_RANGE, jnp.where(ok_all, FLOW_OK, FLOW_FAILED)
    ).astype(jnp.int32)
    return g, status, min_eig


def precompute_prev(prev_img: jnp.ndarray, params: LKParams):
    """Pyramid + Scharr gradients of the previous frame (cacheable)."""
    pyr = build_pyramid(prev_img, params.max_level)
    grads = [scharr_gradients(p) for p in pyr]
    return pyr, grads
