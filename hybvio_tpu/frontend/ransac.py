"""RANSAC outlier rejection for tracked feature pairs.

RANSAC2 (rotation-only 2-point) port of the reference rot_ransac (reference:
src/tracker/rot_ransac.cpp): hypotheses map onto vmap — K index pairs are
drawn at once, each solves a Kabsch rotation (3x3 SVD), inliers are counted by
reprojection distance, and the best model is refit on its inliers. Its inlier
fraction doubles as the visual-stationarity score (reference:
ransac_pipeline.cpp:119,149).

RANSAC5 (Nister essential matrix) and RANSAC3/upright-2p (stereo) follow the
same vmapped-hypotheses pattern; see ransac5.py / stereo modules.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.cameras import Camera, pixel_to_ray, ray_to_pixel

ROT_RANSAC_MAX_ITERS = 100  # (reference: rot_ransac.cpp:6)


class Ransac2Result(NamedTuple):
    R: jnp.ndarray  # (3,3) best rotation
    inliers: jnp.ndarray  # (T,) bool (over all slots; invalid slots False)
    inlier_count: jnp.ndarray  # () int32
    score: jnp.ndarray  # () inlier fraction among tracked


def _kabsch(p1, p2, w):
    """Rotation minimizing sum w_i |p2_i - R p1_i|^2 (reference:
    solveRotation, rot_ransac.cpp:141-167, Kanatani 1994)."""
    Hm = jnp.einsum("n,ni,nj->ij", w, p1, p2)
    U, _, Vt = jnp.linalg.svd(Hm)
    det = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.asarray([1.0, 1.0, jnp.sign(det)], Hm.dtype))
    # guard: sign(0) = 0 would zero a row; treat as +1
    D = jnp.where(det == 0, jnp.eye(3, dtype=Hm.dtype), D)
    return Vt.T @ D @ U.T


def ransac2(
    cam1: Camera,
    cam2: Camera,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    valid: jnp.ndarray,
    rng_key,
    threshold_px: float,
    max_iters: int = ROT_RANSAC_MAX_ITERS,
) -> Ransac2Result:
    """Rotation-only RANSAC over tracked pixel pairs.

    pts1/pts2: (T, 2) previous/current pixel positions; valid: (T,) mask.
    threshold_px: inlier threshold in pixels (already scale-adjusted by the
    caller: reference multiplies by min(dim)/720).
    """
    dtype = pts1.dtype
    T = pts1.shape[0]
    p1, _ = pixel_to_ray(cam1, pts1)
    p2, _ = pixel_to_ray(cam2, pts2)
    w = valid.astype(dtype)
    n_tracked = jnp.sum(valid)

    # hypothesis index pairs; equal indices are discarded (reference skips them)
    k1, k2 = jax.random.split(rng_key)
    idx = jax.random.randint(k1, (max_iters, 2), 0, jnp.maximum(n_tracked, 1))
    # map "rank among valid" -> slot index so sampling is uniform over valid
    order = jnp.argsort(~valid, stable=True)  # valid slots first
    pair_slots = order[idx]  # (K, 2)
    distinct = pair_slots[:, 0] != pair_slots[:, 1]

    thr2 = threshold_px * threshold_px

    def count_inliers(R):
        proj, ok = ray_to_pixel(cam2, p1 @ R.T)
        d2 = jnp.sum((proj - pts2) ** 2, axis=-1)
        inl = valid & ok & (d2 <= thr2)
        return inl

    def hypothesis(slots, ok_pair):
        wpair = jnp.zeros(T, dtype).at[slots[0]].set(1.0).at[slots[1]].add(1.0)
        R = _kabsch(p1, p2, wpair)
        inl = count_inliers(R)
        cnt = jnp.where(ok_pair, jnp.sum(inl), -1)
        return R, cnt

    Rs, counts = jax.vmap(hypothesis)(pair_slots, distinct & (n_tracked >= 2))
    best = jnp.argmax(counts)
    R_best = Rs[best]

    # refit on inliers (reference: rot_ransac.cpp:104-115)
    inl0 = count_inliers(R_best)
    enough = jnp.sum(inl0) >= 2
    R_refit = _kabsch(p1, p2, inl0.astype(dtype))
    R_final = jnp.where(enough, R_refit, R_best)
    inl = count_inliers(R_final)
    cnt = jnp.sum(inl)
    score = cnt / jnp.maximum(n_tracked, 1).astype(dtype)
    return Ransac2Result(R=R_final, inliers=inl, inlier_count=cnt.astype(jnp.int32), score=score)
