"""Self-detected multi-scale ORB keypoints for SLAM keyframes.

The reference SLAM module detects its own ORB features on an
``orbScaleLevels``-level x``orbScaleFactor`` image pyramid with dual FAST
thresholds ``orbInitialFastThreshold``/``orbMinFastThreshold`` (reference:
codegen/parameter_definitions.c:479-484; lineage OpenVSLAM/ORB-SLAM), giving
hundreds of scale-indexed keypoints per keyframe. Tracker features alone are
single-scale: their descriptors only match when a place is revisited at the
same viewing distance. Sampling the rotated-BRIEF pattern on the pyramid
LEVEL where a keypoint is detected makes the descriptor (approximately)
scale-invariant — a wall revisited at 2x the distance re-detects at ~level
log_1.2(2) with the same patch content.

TPU-native shape: static shapes throughout — per-level bilinear resize,
FAST-9/16 via 16 static rolls (frontend/fast.py), per-cell block-max NMS
with the dual-threshold fallback (a cell with no >=initial-threshold corner
falls back to its best >=min-threshold corner, the fixed-shape analog of
ORB-SLAM's per-cell FAST retry), static top-k per level, and vmapped
rotated-BRIEF sampling on the level image. It runs on the host CPU backend
at keyframe rate (slam/host.py), like the reference's dedicated SLAM thread.

Each level is TWO jitted programs, not one: the FAST response is
materialized before the block-max/top-k stage. Fused, XLA re-computes the
16-roll FAST chain inside every reduction that consumes it (measured 412 ms
vs ~120 ms per 752x480 keyframe on the host backend); `optimization_barrier`
does not stop the re-fusion. On the CPU backend the extra dispatches cost
microseconds.
"""
from __future__ import annotations

import numpy as np

from ..frontend.fast import fast_score
from ..frontend.gftt import block_max_packed
from .host import host_jit


def _level_geometry(H: int, W: int, n_levels: int, scale_factor: float,
                    total: int, min_dim: int = 48):
    """Static per-level (Hl, Wl, k_l) allocation.

    Feature counts follow ORB-SLAM's geometric split (proportional to
    1/scale^l so coarse levels contribute fewer but non-zero keypoints);
    levels smaller than min_dim are dropped.
    """
    shapes = []
    for l in range(n_levels):
        s = scale_factor ** l
        Hl, Wl = int(round(H / s)), int(round(W / s))
        if min(Hl, Wl) < min_dim:
            break
        shapes.append((Hl, Wl))
    n = len(shapes)
    inv = np.array([1.0 / scale_factor ** l for l in range(n)])
    frac = inv / inv.sum()
    ks = np.maximum(np.round(frac * total).astype(int), 8)
    return [(Hl, Wl, int(k)) for (Hl, Wl), k in zip(shapes, ks)]


def make_multiscale_orb(H: int, W: int, n_levels: int = 8,
                        scale_factor: float = 1.2, total_kps: int = 256,
                        thr_init: float = 20.0 / 255.0,
                        thr_min: float = 7.0 / 255.0, cell: int = 16):
    """Build the jitted multi-scale detector for an (H, W) image.

    Returns (fn, N): fn(image) -> (pts (N,2) level-0 pixel xy, level (N,)
    int32, desc (N,256) +/-1 float32, valid (N,)); N is the static keypoint
    capacity (sum of per-level budgets).
    """
    import jax
    import jax.numpy as jnp

    from .orb import orb_descriptors

    geom = _level_geometry(H, W, n_levels, scale_factor, total_kps)
    N = sum(k for _, _, k in geom)

    def make_resp(l, Hl, Wl):
        def resp_fn(prev_img):
            # bilinear resize from the previous level (chained 1/1.2 steps
            # stay crisper than one big decimation). jax.image.resize lowers
            # to two interpolation-matrix contractions (MXU/SIMD-friendly),
            # not per-pixel gathers.
            img_l = (jax.image.resize(prev_img, (Hl, Wl), "bilinear")
                     if l > 0 else prev_img)
            # dual-threshold FAST: one pass at thr_min suffices — the score
            # is max-over-windows of the window's min |d| among taps passing
            # thr_min, so score > thr_init certifies a window whose taps ALL
            # clear thr_init, i.e. exactly a thr_init FAST corner.
            return img_l, fast_score(img_l, thr_min)

        return host_jit(resp_fn)

    def make_select(l, Hl, Wl, k):
        def select_fn(img_l, resp):
            dtype = img_l.dtype
            # masking scores to > thr_init never changes a cell's argmax
            # pixel, so one block-max serves both thresholds: a cell is
            # "strong" iff its best weak-threshold corner clears thr_init
            # (per-cell preference for strong corners = ORB-SLAM 20/7 retry).
            s_lo, xy = block_max_packed(resp, cell)
            strong = s_lo > thr_init
            score = jnp.where(strong, s_lo + 1.0, s_lo)  # prefer strong
            score = jnp.where(s_lo > 0, score, -jnp.inf)
            kk = min(k, score.shape[0])
            top_s, top_i = jax.lax.top_k(score, kk)
            top_xy = xy[top_i].astype(dtype)
            ok = jnp.isfinite(top_s)
            desc, ok_d = orb_descriptors(img_l, top_xy, ok)
            # map to level-0 pixels
            pts0 = top_xy * jnp.asarray([W / Wl, H / Hl], dtype)
            if kk < k:  # pad (tiny levels with fewer cells than budget)
                pad = k - kk
                pts0 = jnp.concatenate([pts0, jnp.zeros((pad, 2), dtype)])
                desc = jnp.concatenate(
                    [desc, jnp.zeros((pad, desc.shape[1]), desc.dtype)])
                ok_d = jnp.concatenate([ok_d, jnp.zeros((pad,), bool)])
            return pts0, desc, ok_d

        return host_jit(select_fn)

    progs = [(make_resp(l, Hl, Wl), make_select(l, Hl, Wl, k))
             for l, (Hl, Wl, k) in enumerate(geom)]

    def detect(img):
        pts_all, lvl_all, desc_all, ok_all = [], [], [], []
        level_img = img
        for l, ((resp_fn, select_fn), (_, _, k)) in enumerate(zip(progs, geom)):
            level_img, resp = resp_fn(level_img)
            pts0, desc, ok_d = select_fn(level_img, resp)
            pts_all.append(np.asarray(pts0))
            lvl_all.append(np.full((k,), l, np.int32))
            desc_all.append(np.asarray(desc))
            ok_all.append(np.asarray(ok_d))
        return (np.concatenate(pts_all), np.concatenate(lvl_all),
                np.concatenate(desc_all), np.concatenate(ok_all))

    return detect, N
