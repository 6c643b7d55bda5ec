"""FAST corner detector, TPU-native (legacy detector option).

The reference offers cv::FAST as an alternative feature detector selected by
``tracker.featureDetector`` (reference: src/tracker/feature_detector_legacy.cpp
:34-60, dispatch feature_detector.cpp:671-675). This is FAST-9/16: a pixel is
a corner if 9 contiguous pixels on the 16-pixel Bresenham circle are all
brighter than center+t or all darker than center-t. The score is the usual
max-t-for-which-corner proxy: min over the best arc of |p_i - center| (OpenCV
uses a binary-search-equivalent score).

TPU shape: the 16 circle taps become 16 static rolls of the image (pure
vectorized compares; no gathers), contiguity via cyclic cumulative AND over a
doubled 32-long boolean ring realized as sum of shifted AND-products.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3, clockwise from 12 o'clock (dy, dx)
_CIRCLE = np.array([
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
], dtype=np.int32)


def _ring_taps(img: jnp.ndarray) -> jnp.ndarray:
    """(16, H, W): circle neighbor intensities via static rolls (edges wrap;
    callers mask a 3-px border)."""
    taps = [jnp.roll(img, (-int(dy), -int(dx)), axis=(0, 1))
            for dy, dx in _CIRCLE]
    return jnp.stack(taps, axis=0)


def fast_score(img: jnp.ndarray, threshold: float, arc: int = 9) -> jnp.ndarray:
    """FAST-N/16 corner response. img (H, W) float in [0, 1]; threshold in the
    same units (reference default cv threshold / 255). Returns (H, W) scores,
    0 where not a corner; 3-px border zeroed."""
    H, W = img.shape
    taps = _ring_taps(img)  # (16, H, W)
    d = taps - img[None]
    brighter = d > threshold
    darker = d < -threshold

    def arc_response(mask, mag):
        # does any window of `arc` contiguous ring positions hold? compute via
        # cyclic windowed AND; score = max over windows of min |d| in window.
        # NOTE: the chained elementwise form fuses into ONE XLA kernel (taps
        # stay in registers); a log-doubling rewrite with rolls measured 8x
        # SLOWER on the host backend because concatenates break fusion.
        best = jnp.zeros(img.shape, img.dtype)
        for s in range(16):
            idx = [(s + k) % 16 for k in range(arc)]
            all_on = mask[idx[0]]
            mmin = mag[idx[0]]
            for j in idx[1:]:
                all_on = all_on & mask[j]
                mmin = jnp.minimum(mmin, mag[j])
            best = jnp.maximum(best, jnp.where(all_on, mmin, 0.0))
        return best

    mag = jnp.abs(d)
    score = jnp.maximum(arc_response(brighter, mag), arc_response(darker, mag))
    border = jnp.zeros((H, W), bool).at[3:H - 3, 3:W - 3].set(True)
    return jnp.where(border, score, 0.0)


def detect_fast(img: jnp.ndarray, n_out: int, existing_xy: jnp.ndarray,
                existing_valid: jnp.ndarray, mask_radius, min_distance: float,
                threshold: float = 20.0 / 255.0, **_ignored):
    """FAST corners with the same selection contract as gftt.detect_corners
    (NMS + greedy min distance vs existing tracks). Returns (xy, score, valid)."""
    from .gftt import block_max_candidates
    import jax

    H, W = img.shape
    resp = fast_score(img, threshold)
    cell = max(int(min_distance) // 2, 2)
    scores, xy = block_max_candidates(resp, cell)
    ok = scores > 0.0
    scores = jnp.where(ok, scores, -jnp.inf)

    k = min(256, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_xy = xy[top_idx].astype(img.dtype)
    d2_exist = jnp.sum((top_xy[:, None, :] - existing_xy[None, :, :]) ** 2, -1)
    near_exist = jnp.any(
        (d2_exist < mask_radius * mask_radius) & existing_valid[None, :], axis=1)
    cand_ok = jnp.isfinite(top_scores) & ~near_exist
    min_d2 = min_distance * min_distance
    d2 = jnp.sum((top_xy[:, None, :] - top_xy[None, :, :]) ** 2, -1)
    from .gftt import _greedy_select

    taken = _greedy_select(d2, cand_ok, min_d2, k)
    order = jnp.argsort(~taken, stable=True)
    out_idx = order[:n_out]
    return top_xy[out_idx], top_scores[out_idx], taken[out_idx]
