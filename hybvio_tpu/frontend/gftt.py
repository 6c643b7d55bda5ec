"""GFTT (Shi-Tomasi) corner detection, TPU-native.

Port of the reference's shader-pipeline detector (reference:
src/tracker/feature_detector.cpp): Sobel gradients -> 2x2 structure matrix ->
box filter (gfttBlockSize) -> min-eigenvalue response tr/2 - sqrt((tr/2)^2 -
det) with gfttMinResponse cutoff -> hierarchical block-max NMS -> greedy
min-distance selection against existing tracks. The GLSL reduction shaders
become XLA reshit/max reductions; the greedy pass is a small lax.scan.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pyramid import box_filter, sobel_gradients


import os as _os

# fused kernel on TPU (ops/gftt_pallas.py); XLA elsewhere. HYBVIO_NO_PALLAS=1
# falls back to the pure-XLA paths everywhere (numerics bisection switch).
USE_PALLAS = _os.environ.get("HYBVIO_NO_PALLAS", "0").lower() in ("", "0", "false")


def _greedy_select(d2, cand_ok, min_d2: float, k: int):
    """Greedy min-distance selection: on TPU the sequential loop runs inside
    one Pallas kernel (ops/nms_pallas.py); elsewhere a lax.scan."""
    if USE_PALLAS and jax.default_backend() == "tpu":
        from ..ops.nms_pallas import PALLAS_AVAILABLE, greedy_min_distance_pallas

        if PALLAS_AVAILABLE:
            return greedy_min_distance_pallas(d2, cand_ok, min_d2)

    def body(selected, i):
        near_sel = jnp.any(selected & (d2[i] < min_d2))
        take = cand_ok[i] & ~near_sel
        return selected.at[i].set(take), take

    _, taken = jax.lax.scan(body, jnp.zeros((k,), bool), jnp.arange(k),
                            unroll=16)
    return taken


def corner_response(img: jnp.ndarray, block_size: int = 3) -> jnp.ndarray:
    """Shi-Tomasi min-eigenvalue response (reference: feature_detector.cpp:220-255).

    img: (H, W) float intensities in [0, 1]. Response units match the
    reference's (which feeds [0,1]-scaled GL textures): gradients of the
    normalized image, averaged over the block.

    On TPU this dispatches to the fused Pallas kernel (single HBM round
    trip); the XLA separable-conv path is the reference implementation and
    the fallback on other backends.
    """
    if USE_PALLAS and jax.default_backend() == "tpu":
        from ..ops.gftt_pallas import PALLAS_AVAILABLE, corner_response_pallas

        if PALLAS_AVAILABLE:
            return corner_response_pallas(img, block_size)
    ix, iy = sobel_gradients(img)
    # UNNORMALIZED Sobel like the reference shaders (kernel weights +-1, +-2
    # with no 1/4 scaling, feature_detector.cpp:47-65): gfttMinResponse's
    # default (0.001) is calibrated to these units; a 1/4-per-axis
    # normalization makes every response 16x smaller and starves detection
    # on textured imagery.
    n = block_size * block_size
    sxx = box_filter(ix * ix, block_size) / n
    syy = box_filter(iy * iy, block_size) / n
    sxy = box_filter(ix * iy, block_size) / n
    tr2 = 0.5 * (sxx + syy)
    det = sxx * syy - sxy * sxy
    disc = jnp.sqrt(jnp.maximum(tr2 * tr2 - det, 0.0))
    return tr2 - disc


def block_max_candidates(response: jnp.ndarray, cell: int):
    """Max response + its position per cell grid (the reference's hierarchical
    block-max reduction, feature_detector.cpp:317-523).

    Returns (scores (NC,), xy (NC, 2)) with NC = (H//cell) * (W//cell).
    """
    H, W = response.shape
    Hc, Wc = H // cell, W // cell
    r = response[: Hc * cell, : Wc * cell].reshape(Hc, cell, Wc, cell)
    r = jnp.transpose(r, (0, 2, 1, 3)).reshape(Hc, Wc, cell * cell)
    scores = jnp.max(r, axis=-1)
    idx = jnp.argmax(r, axis=-1)
    dy = idx // cell
    dx = idx % cell
    ys = jnp.arange(Hc)[:, None] * cell + dy
    xs = jnp.arange(Wc)[None, :] * cell + dx
    xy = jnp.stack([xs, ys], axis=-1).reshape(-1, 2)
    return scores.reshape(-1), xy


def block_max_packed(response: jnp.ndarray, cell: int):
    """`block_max_candidates` as ONE packed reduction instead of a max plus
    an argmax (3.5x faster on the CPU backend, where each reduction pass over
    the (Hc, Wc, cell^2) tile array is a full sweep).

    Scores are assumed in [0, 1] (true for FAST/GFTT responses of [0, 1]
    images) and quantized to 16 bits — granularity 1.5e-5, which only
    perturbs tie-breaking — then packed with the in-cell pixel index into one
    int32 so a single max returns both. Used by the SLAM keyframe detector;
    the tracker keeps the exact two-reduction form inside its fused step.
    """
    H, W = response.shape
    Hc, Wc = H // cell, W // cell
    r = response[: Hc * cell, : Wc * cell].reshape(Hc, cell, Wc, cell)
    r = jnp.transpose(r, (0, 2, 1, 3)).reshape(Hc, Wc, cell * cell)
    nidx = cell * cell
    shift = 1
    while shift < nidx:
        shift *= 2
    q = jnp.round(jnp.clip(r, 0.0, 1.0) * 65535.0).astype(jnp.int32)
    packed = q * shift + jnp.arange(nidx, dtype=jnp.int32)
    best = jnp.max(packed, axis=-1)
    idx = best % shift
    scores = (best // shift).astype(response.dtype) / 65535.0
    dy = idx // cell
    dx = idx % cell
    ys = jnp.arange(Hc)[:, None] * cell + dy
    xs = jnp.arange(Wc)[None, :] * cell + dx
    xy = jnp.stack([xs, ys], axis=-1).reshape(-1, 2)
    return scores.reshape(-1), xy


def detect_corners(
    img: jnp.ndarray,
    n_out: int,
    existing_xy: jnp.ndarray,
    existing_valid: jnp.ndarray,
    mask_radius,
    min_distance: float,
    block_size: int = 3,
    min_response: float = 1e-3,
    n_candidates: int = 256,
    margin: int = 5,
    crop_fraction: float = 1.0,
    quality_level: float = 0.0,
):
    """Detect up to n_out new corners.

    existing_xy: (T, 2) current track positions with validity mask; candidates
    within mask_radius (runtime scalar; reference: adaptive mask,
    tracker.cpp:560-575) of an existing track, or within min_distance of a
    stronger selected candidate, are rejected (greedy, response-ordered;
    reference: feature_detector.cpp:620-636).

    Returns (xy (n_out, 2), score (n_out,), valid (n_out,)).
    """
    H, W = img.shape
    resp = corner_response(img, block_size)
    cell = max(int(min_distance) // 2, 2)
    scores, xy = block_max_candidates(resp, cell)

    # border margin + optional central-crop (reference: partOfImageToDetectFeatures)
    x, y = xy[..., 0], xy[..., 1]
    ok = (x >= margin) & (x < W - margin) & (y >= margin) & (y < H - margin)
    if crop_fraction < 1.0:
        xd = W * (1 - crop_fraction) / 2
        yd = H * (1 - crop_fraction) / 2
        ok &= (x >= xd) & (x < W - xd) & (y >= yd) & (y < H - yd)
    ok &= scores > min_response
    if quality_level > 0.0:
        # cv::GFTTDetector semantics: reject candidates below
        # qualityLevel * (best response) (reference:
        # feature_detector_legacy.cpp:130 setQualityLevel)
        ok &= scores > quality_level * jnp.max(scores)
    scores = jnp.where(ok, scores, -jnp.inf)

    # candidate pool must cover the requested output count (n_out > pool
    # would silently truncate the output shape and break downstream masks)
    k = min(max(n_candidates, n_out), scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_xy = xy[top_idx].astype(img.dtype)

    # reject near existing tracks
    d2_exist = jnp.sum(
        (top_xy[:, None, :] - existing_xy[None, :, :]) ** 2, axis=-1)
    near_exist = jnp.any(
        (d2_exist < mask_radius * mask_radius) & existing_valid[None, :], axis=1)
    cand_ok = jnp.isfinite(top_scores) & ~near_exist

    # greedy min-distance among candidates (response-ordered = top_k order)
    min_d2 = min_distance * min_distance
    d2 = jnp.sum((top_xy[:, None, :] - top_xy[None, :, :]) ** 2, axis=-1)
    taken = _greedy_select(d2, cand_ok, min_d2, k)

    # compact the first n_out taken candidates
    order = jnp.argsort(~taken, stable=True)  # taken first, in response order
    out_idx = order[:n_out]
    out_valid = taken[out_idx]
    out_xy = top_xy[out_idx]
    out_scores = top_scores[out_idx]
    return out_xy, out_scores, out_valid


def subpixel_refine(img: jnp.ndarray, xy: jnp.ndarray, window: int = 10,
                    iters: int = 5, epsilon: float = 0.0):
    """Corner subpixel refinement (reference: src/tracker/subpixel_adjuster.cpp
    wrapping cv::cornerSubPix). Gradient-product centroid iteration over a
    (2*window+1)^2 neighborhood; out-of-bounds results revert.

    TPU-shaped: full-image central-difference gradients once, then per-corner
    contiguous patch slices + single-shift bilinear blends (no per-pixel
    gathers in the loop)."""
    from .lk import _gather_patches, _window_shift_sample

    H, W = img.shape
    r = window
    w = 2 * r + 1
    N = xy.shape[0]
    dtype = img.dtype

    gx_img = jnp.zeros_like(img).at[:, 1:-1].set((img[:, 2:] - img[:, :-2]) * 0.5)
    gy_img = jnp.zeros_like(img).at[1:-1, :].set((img[2:, :] - img[:-2, :]) * 0.5)

    # one patch per corner, large enough for the refinement drift (< window)
    ps = 2 * w + 3
    gxp, c = _gather_patches(gx_img, xy, ps)
    gyp, _ = _gather_patches(gy_img, xy, ps)

    ax = jnp.arange(-r, r + 1, dtype=dtype)
    ox, oy = jnp.meshgrid(ax, ax, indexing="xy")

    def body(_, p):
        gx = _window_shift_sample(gxp, c, p, w, ps)  # (N,w,w)
        gy = _window_shift_sample(gyp, c, p, w, ps)
        px = p[:, 0][:, None, None] + ox[None]
        py = p[:, 1][:, None, None] + oy[None]
        gxx = jnp.sum(gx * gx, axis=(1, 2))
        gyy = jnp.sum(gy * gy, axis=(1, 2))
        gxy = jnp.sum(gx * gy, axis=(1, 2))
        bx = jnp.sum(gx * gx * px + gx * gy * py, axis=(1, 2))
        by = jnp.sum(gx * gy * px + gy * gy * py, axis=(1, 2))
        det = gxx * gyy - gxy * gxy
        ok = jnp.abs(det) > 1e-12
        safe_det = jnp.where(ok, det, 1.0)
        nx = (gyy * bx - gxy * by) / safe_det
        ny = (-gxy * bx + gxx * by) / safe_det
        return jnp.where(ok[:, None], jnp.stack([nx, ny], axis=1), p)

    if epsilon > 0.0:
        # cv::TermCriteria COUNT|EPS parity (reference:
        # subpixel_adjuster.cpp:31-33 subPixMaxIter + subPixEpsilon): stop
        # when every corner moved less than epsilon in an iteration
        def cond(state):
            i, p, shift = state
            return (i < iters) & (shift >= epsilon)

        def wbody(state):
            i, p, _ = state
            p2 = body(i, p)
            return i + 1, p2, jnp.max(jnp.linalg.norm(p2 - p, axis=1))

        _, p, _ = jax.lax.while_loop(
            cond, wbody, (jnp.zeros((), jnp.int32), xy,
                          jnp.full((), jnp.inf, dtype)))
    else:
        p = jax.lax.fori_loop(0, iters, body, xy)
    in_bounds = (p[:, 0] >= 0) & (p[:, 0] < W) & (p[:, 1] >= 0) & (p[:, 1] < H)
    moved_ok = jnp.linalg.norm(p - xy, axis=1) < 2.0 * window
    return jnp.where((in_bounds & moved_ok)[:, None], p, xy)
