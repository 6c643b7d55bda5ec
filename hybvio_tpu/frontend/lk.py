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

# Conversion of our min-eigenvalue units to cv::calcOpticalFlowPyrLK's, so
# pyrLKMinEigThreshold keeps the reference's parameter scale (reference
# default 1e-4 assumes OpenCV semantics): OpenCV computes the structure
# matrix from UNNORMALIZED int Scharr derivatives of 8-bit images and scales
# products by FLT_SCALE = 2^-20; our derivatives are (1/32)-normalized Scharr
# of [0,1] floats, i.e. smaller by 32*255 each.
MIN_EIG_CV_SCALE = (32.0 * 255.0) ** 2 / float(1 << 20)


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


def _gather_patches(img, centers, ps: int):
    """Extract (N, ps, ps) integer-aligned patches around centers (N,2).

    On TPU this is a Pallas DMA kernel (ops/patch_gather_pallas.py): the
    vmapped dynamic-slice form lowers to an XLA gather that was measured at
    60% of the whole stereo step. Elsewhere, one dynamic-slice per feature.
    Callers then sample bilinearly WITHIN these patches.
    Returns (patches, corner (N,2) int patch origins)."""
    H, W = img.shape
    r = ps // 2
    cx = jnp.clip(jnp.floor(centers[:, 0]).astype(jnp.int32) - r, 0, W - ps)
    cy = jnp.clip(jnp.floor(centers[:, 1]).astype(jnp.int32) - r, 0, H - ps)

    from .pyramid import USE_PALLAS as _USE_PALLAS
    if (jax.default_backend() == "tpu" and img.dtype == jnp.float32
            and _USE_PALLAS):
        # the kernel's (8, 128) alignment algebra is f32-tile specific
        from ..ops.patch_gather_pallas import (
            PALLAS_AVAILABLE, gather_patches_pallas,
        )

        if PALLAS_AVAILABLE:
            patches = gather_patches_pallas(img, cy, cx, ps)
            return patches, jnp.stack([cx, cy], axis=1)

    def one(x0, y0):
        return jax.lax.dynamic_slice(img, (y0, x0), (ps, ps))

    patches = jax.vmap(one)(cx, cy)
    return patches, jnp.stack([cx, cy], axis=1)


def _bilinear_patch(patches_flat, corner, pts, ps: int):
    """Bilinear sample per-feature patches at absolute pixel positions.

    patches_flat: (N, ps*ps); corner: (N,2) patch origins; pts: (N,K,2).
    Out-of-patch positions clamp (callers bound the motion per level).
    """
    local = pts - corner[:, None, :].astype(pts.dtype)
    x = jnp.clip(local[..., 0], 0.0, ps - 1.001)
    y = jnp.clip(local[..., 1], 0.0, ps - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    i00 = y0 * ps + x0
    v00 = jnp.take_along_axis(patches_flat, i00, axis=1)
    v01 = jnp.take_along_axis(patches_flat, i00 + 1, axis=1)
    v10 = jnp.take_along_axis(patches_flat, i00 + ps, axis=1)
    v11 = jnp.take_along_axis(patches_flat, i00 + ps + 1, axis=1)
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def _window_shift_sample(patches, corner, q, w: int, ps: int):
    """Sample the RIGID (w x w) window at subpixel center q from per-feature
    patches via one contiguous dynamic slice + 4-tap fractional blend.

    The window's sample positions form an integer grid offset by a single
    per-feature subpixel shift, so instead of K arbitrary gathers this is a
    (w+1, w+1) dynamic_slice (contiguous rows — fast on TPU) and an
    elementwise blend. patches: (N, ps, ps); corner: (N, 2) origins;
    q: (N, 2) window centers. Returns (N, w, w).
    """
    r = w // 2
    dtype = q.dtype
    local = q - corner.astype(dtype)
    # valid shifts keep the (w+1) support inside the patch
    x = jnp.clip(local[:, 0] - r, 0.0, ps - w - 0.001)
    y = jnp.clip(local[:, 1] - r, 0.0, ps - w - 0.001)

    # bilinear SELECTION MATRICES: window = Sy @ patch @ Sx^T with
    # Sy[j, y0+j] = 1-fy, Sy[j, y0+j+1] = fy. Two batched matmuls on the MXU
    # replace per-lane indexed addressing entirely (TPUs hate gathers).
    rows = jax.lax.broadcasted_iota(jnp.int32, (w, ps), 0).astype(dtype)  # j
    cols = jax.lax.broadcasted_iota(jnp.int32, (w, ps), 1).astype(dtype)  # p

    def sel(shift):
        # shift: (N,) fractional start; S: (N, w, ps)
        d = cols[None] - rows[None] - shift[:, None, None]  # p - j - shift
        return jnp.maximum(0.0, 1.0 - jnp.abs(d))  # tent = bilinear weights

    Sy = sel(y)
    Sx = sel(x)
    return jnp.einsum("nwp,npq,nvq->nwv", Sy, patches, Sx,
                      preferred_element_type=dtype)


def lk_track_level(
    prev_img, prev_ix, prev_iy, cur_img, prev_pts, guesses, params: LKParams,
    final_level: bool = True, margin: int = 8,
):
    """One pyramid level of LK for all features.

    prev_pts, guesses: (N, 2) at THIS level's scale. Returns (new_pts (N,2),
    ok (N,), min_eig (N,)).

    final_level: at upper pyramid levels, points whose window leaves the
    (smaller) image are SKIPPED — their guess passes through unchanged — not
    failed; cv::calcOpticalFlowPyrLK only sets status at level 0 the same way.

    TPU-shaped implementation: the template window + gradients come from one
    contiguous patch slice per feature; the iterations bilinearly sample a
    slightly larger current-image patch around the guess, so the hot loop does
    only small-domain batched gathers (jnp.take_along_axis over ps*ps
    elements) instead of image-wide gathers.
    """
    dtype = prev_img.dtype
    offs = _window_offsets(params.window_size, dtype)  # (K,2)
    H, W = prev_img.shape
    w = params.window_size
    r = w // 2
    N = prev_pts.shape[0]
    # the (w + 2*margin + 3) search patch must fit this level's image
    margin = max(min(margin, (min(H, W) - w - 3) // 2), 1)

    # template patches (window + 1px bilinear margin)
    ps_t = w + 3
    tp, tc = _gather_patches(prev_img, prev_pts, ps_t)
    xp, _ = _gather_patches(prev_ix, prev_pts, ps_t)
    yp, _ = _gather_patches(prev_iy, prev_pts, ps_t)
    t = _window_shift_sample(tp, tc, prev_pts, w, ps_t).reshape(N, -1)
    ix = _window_shift_sample(xp, tc, prev_pts, w, ps_t).reshape(N, -1)
    iy = _window_shift_sample(yp, tc, prev_pts, w, ps_t).reshape(N, -1)

    gxx = jnp.sum(ix * ix, axis=1)
    gyy = jnp.sum(iy * iy, axis=1)
    gxy = jnp.sum(ix * iy, axis=1)
    nk = offs.shape[0]
    tr2 = 0.5 * (gxx + gyy) / nk
    det_n = (gxx * gyy - gxy * gxy) / (nk * nk)
    min_eig = tr2 - jnp.sqrt(jnp.maximum(tr2 * tr2 - det_n, 0.0))
    det_g = gxx * gyy - gxy * gxy
    ok_g = det_g > 1e-12
    safe_det = jnp.where(ok_g, det_g, 1.0)

    # current-image patches around the guess, with room for the iterations to
    # move (motion beyond the margin re-centers never happens within a level;
    # the pyramid handles large motion, and the caller passes a LARGER margin
    # at the top level, which is where unpredicted large flows land)
    ps_c = w + 2 * margin + 3
    cp, cc = _gather_patches(cur_img, guesses, ps_c)

    def cond(carry):
        q, done, it = carry
        return (it < params.max_iter) & ~jnp.all(done)

    # zero-mean template: the iteration minimizes an illumination-robust
    # residual (window means removed on both sides), so per-frame exposure
    # gain/bias does not bias every step in the gradient direction and walk
    # the window off the feature. cv::calcOpticalFlowPyrLK lacks this and
    # measurably sheds tracks under exposure change; deliberate improvement.
    t_zm = t - jnp.mean(t, axis=1, keepdims=True)

    def body(carry):
        q, done, it = carry
        wv = _window_shift_sample(cp, cc, q, w, ps_c).reshape(N, -1)
        di = (wv - jnp.mean(wv, axis=1, keepdims=True)) - t_zm
        bx = jnp.sum(di * ix, axis=1)
        by = jnp.sum(di * iy, axis=1)
        dx = (gyy * bx - gxy * by) / safe_det
        dy = (-gxy * bx + gxx * by) / safe_det
        delta = jnp.stack([dx, dy], axis=1)
        converged = jnp.sum(delta * delta, axis=1) < params.epsilon**2
        q_new = jnp.where(done[:, None], q, q - delta)
        return (q_new, done | converged, it + 1)

    # points whose TEMPLATE window leaves this level's image can't iterate
    # meaningfully (clamped patches): skip them (guess passes through)
    templ_ok = (
        (prev_pts[:, 0] >= r) & (prev_pts[:, 0] < W - r)
        & (prev_pts[:, 1] >= r) & (prev_pts[:, 1] < H - r)
    )

    # while_loop with an all-converged early exit: with odometry-predicted
    # guesses most features converge in a few iterations, so the average trip
    # count is far below pyrLKMaxIter (matching OpenCV's epsilon exit)
    q, _, _ = jax.lax.while_loop(
        cond, body, (guesses, ~ok_g | ~templ_ok, jnp.zeros((), jnp.int32)))
    q = jnp.where(templ_ok[:, None], q, guesses)

    if not final_level:
        # upper level: contribute flow where trackable, never fail a track
        # (cv::calcOpticalFlowPyrLK only sets status at level 0)
        return q, jnp.ones(N, bool), min_eig

    # fail if the track left its sampling patch (would have clamped)
    local = q - cc.astype(dtype)
    in_patch = ((local[:, 0] >= r + 1) & (local[:, 0] < ps_c - r - 2)
                & (local[:, 1] >= r + 1) & (local[:, 1] < ps_c - r - 2))
    in_bounds = (
        (q[:, 0] >= r) & (q[:, 0] < W - r) & (q[:, 1] >= r) & (q[:, 1] < H - r)
    )
    # appearance residual at the converged position: protects against the LK
    # failure mode where a feature drifts onto low-texture background and
    # freezes at the initial guess (cv::calcOpticalFlowPyrLK has no such
    # check; the reference relies on downstream RANSAC, but a frozen *set* of
    # points forms a false consensus there)
    w_final = _window_shift_sample(cp, cc, q, w, ps_c).reshape(N, -1)
    # zero-mean comparison: per-frame exposure gain/bias must not fail
    # legitimate tracks (brightness constancy is already violated by real
    # cameras; only the structural mismatch matters here)
    d_final = (w_final - jnp.mean(w_final, axis=1, keepdims=True)
               - (t - jnp.mean(t, axis=1, keepdims=True)))
    resid = jnp.mean(jnp.abs(d_final), axis=1)
    contrast = jnp.maximum(jnp.max(t, axis=1) - jnp.min(t, axis=1), 1e-6)
    ok_resid = resid <= jnp.maximum(0.25 * contrast, 0.02)
    return q, ok_g & templ_ok & in_bounds & in_patch & ok_resid, min_eig


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
            cur_pyr[lvl], p_lvl, g, params, final_level=(lvl == 0),
            # top level absorbs the unpredicted motion: double budget there
            # (its image is 4^L smaller, so the patch cost is negligible)
            margin=16 if lvl == L and L > 0 else 8)
        ok_all = ok_all & ok
        if lvl > 0:
            g = new_pts * 2.0
        else:
            g = new_pts

    # final eigenvalue check at level 0, in OpenCV's units so the
    # pyrLKMinEigThreshold parameter scale matches the reference
    ok_all = ok_all & (min_eig * MIN_EIG_CV_SCALE >= params.min_eig_threshold)
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
