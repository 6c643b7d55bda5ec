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


def _kabsch_svd(p1, p2, w):
    """SVD Kabsch (reference: solveRotation, rot_ransac.cpp:141-167,
    Kanatani 1994). Kept as the reference implementation / test oracle."""
    Hm = jnp.einsum("n,ni,nj->ij", w, p1, p2)
    U, _, Vt = jnp.linalg.svd(Hm)
    det = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.asarray([1.0, 1.0, jnp.sign(det)], Hm.dtype))
    # guard: sign(0) = 0 would zero a row; treat as +1
    D = jnp.where(det == 0, jnp.eye(3, dtype=Hm.dtype), D)
    return Vt.T @ D @ U.T


def _rotation_from_cross_cov(Hm, n_newton_iters: int = 20):
    """Rotation maximizing tr(R Hm) with Hm = sum w p1 p2^T via Horn's
    quaternion method (Horn 1987): the optimal unit quaternion is the
    top eigenvector of a symmetric trace-free 4x4 N built from Hm.

    Eigensolve = QCP (Theobald 2005): Newton's iteration on the quartic
    characteristic polynomial from the upper bound ||N||_F (monotone
    convergence to the largest root), then the eigenvector as a column of
    the Cayley-Hamilton adjugate of (N - lambda I), with a second-order
    fallback when lambda_max has multiplicity 2 (degenerate 2-point sets
    where any rotation in a 1-parameter family is cost-equivalent).
    TPU-friendly — two 4x4 matmuls + scalar arithmetic, no SVD/eigh.
    Returns R with R p1 ~ p2."""
    dtype = Hm.dtype
    S = Hm
    tr = S[0, 0] + S[1, 1] + S[2, 2]
    N = jnp.asarray([
        [tr, S[1, 2] - S[2, 1], S[2, 0] - S[0, 2], S[0, 1] - S[1, 0]],
        [S[1, 2] - S[2, 1], 2 * S[0, 0] - tr, S[0, 1] + S[1, 0], S[2, 0] + S[0, 2]],
        [S[2, 0] - S[0, 2], S[0, 1] + S[1, 0], 2 * S[1, 1] - tr, S[1, 2] + S[2, 1]],
        [S[0, 1] - S[1, 0], S[2, 0] + S[0, 2], S[1, 2] + S[2, 1], 2 * S[2, 2] - tr],
    ], dtype)
    # scale so eigenvalues are O(1) (f32-safe polynomial arithmetic)
    fnorm = jnp.sqrt(jnp.sum(N * N))
    scale = jnp.maximum(fnorm, jnp.asarray(1e-30, dtype))
    N = N / scale

    # characteristic polynomial of N (symmetric, tr N = 0):
    #   p(x) = x^4 + e2 x^2 - e3 x + e4   via Newton's identities
    N2 = N @ N
    p2 = jnp.trace(N2)  # tr(N^2)
    p3 = jnp.sum(N2 * N)  # tr(N^3) (N symmetric)
    p4 = jnp.sum(N2 * N2)  # tr(N^4)
    e2 = -p2 / 2
    e3 = p3 / 3
    e4 = (p2 * p2 / 2 - p4) / 4

    # Newton from above the largest root: x0 = ||N||_F >= lambda_max;
    # a quartic with all-real roots is convex right of its largest root,
    # so the iteration is monotone and cannot overshoot.
    x = jnp.asarray(1.0, dtype)  # ||N/scale||_F == 1
    for _ in range(n_newton_iters):
        px = ((x * x + e2) * x - e3) * x + e4
        dpx = (4 * x * x + 2 * e2) * x - e3
        x = x - px / jnp.where(jnp.abs(dpx) < 1e-30, 1e-30, dpx)
    lam = x

    # eigenvector = column of adj(N - lam I), via Cayley-Hamilton:
    # for A = N - lam I with char poly x^4 + a3 x^3 + a2 x^2 + a1 x + a0,
    # B = A^3 + a3 A^2 + a2 A + a1 I has columns in null(A) (a0 = det A ~ 0).
    A = N - lam * jnp.eye(4, dtype=dtype)
    A2 = A @ A
    A3 = A2 @ A
    s1 = jnp.trace(A)
    s2 = jnp.trace(A2)
    s3 = jnp.sum(A2 * A)  # tr(A^3)
    a3 = -s1
    a2 = (s1 * s1 - s2) / 2
    a1 = -(s1 ** 3 - 3 * s1 * s2 + 2 * s3) / 6
    B = A3 + a3 * A2 + a2 * A + a1 * jnp.eye(4, dtype=dtype)
    # multiplicity-2 fallback: C = A^2 - s1 A + a2 I maps onto the 2D
    # null eigenspace when rank(A) == 2 (B ~ 0 there)
    C = A2 - s1 * A + a2 * jnp.eye(4, dtype=dtype)

    def best_column(M):
        norms2 = jnp.sum(M * M, axis=0)
        j = jnp.argmax(norms2)
        return M[:, j], jnp.sqrt(norms2[j])

    qB, nB = best_column(B)
    qC, nC = best_column(C)
    q = jnp.where(nB > 1e-6, qB / jnp.maximum(nB, 1e-30),
                  jnp.where(nC > 1e-6, qC / jnp.maximum(nC, 1e-30),
                            jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype)))
    from ..geometry.quaternion import quat_to_rmat

    return quat_to_rmat(q)


def _kabsch(p1, p2, w):
    """Rotation minimizing sum w_i |p2_i - R p1_i|^2 (Horn quaternion form;
    see _rotation_from_cross_cov; SVD oracle in _kabsch_svd)."""
    Hm = jnp.einsum("n,ni,nj->ij", w, p1, p2)
    return _rotation_from_cross_cov(Hm)


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


class Ransac5Result(NamedTuple):
    E: jnp.ndarray  # (3,3) best essential matrix
    inliers: jnp.ndarray  # (T,) bool
    inlier_count: jnp.ndarray  # () int32
    ok: jnp.ndarray  # () bool (enough features)


def ransac5(
    norm1: jnp.ndarray,
    norm2: jnp.ndarray,
    valid: jnp.ndarray,
    rng_key,
    threshold: float,
    max_iters: int = 256,
) -> Ransac5Result:
    """Essential-matrix RANSAC over normalized image coordinates.

    Port of the reference RANSAC5 (reference: ransac_pipeline.cpp:277-396,
    wrapping a vendored OpenCV Nister 5-point solver with an iteration cap
    "alleviating worst-case performance", five_point.cpp:404,
    ptsetreg.hpp:43-44). Hypotheses use the TRUE Nister/Stewenius 5-point
    minimal solver (frontend/five_point.py) — correct for planar scenes and
    minimal samples, unlike an 8-point stand-in — with ALL hypotheses (and
    their up-to-10 solutions each) solved and Sampson-scored as one vmapped
    batch. Only the inlier set is consumed downstream (the reference zeroes
    R/t too, ransac_pipeline.cpp:381-387).

    threshold: in normalized units (reference: 2*ransac5Threshold/(f1+f2)).
    max_iters: hypothesis count (reference: tracker.ransacMaxIters).
    """
    from .five_point import five_point_essential

    dtype = norm1.dtype
    T = norm1.shape[0]
    n_tracked = jnp.sum(valid)
    h1 = jnp.concatenate([norm1, jnp.ones((T, 1), dtype)], axis=1)  # (T,3)
    h2 = jnp.concatenate([norm2, jnp.ones((T, 1), dtype)], axis=1)

    order = jnp.argsort(~valid, stable=True)  # valid slots first
    key1, _ = jax.random.split(rng_key)
    idx = jax.random.randint(key1, (max_iters, 5), 0, jnp.maximum(n_tracked, 1))
    slots = order[idx]  # (K, 5)

    def solve_hyp(sl):
        Es, val = five_point_essential(norm1[sl], norm2[sl], dtype=dtype)
        distinct = jnp.sum(sl[:, None] == sl[None, :]) == 5
        return Es, val & distinct

    Es_all, val_all = jax.vmap(solve_hyp)(slots)  # (K,10,3,3), (K,10)
    Es_flat = Es_all.reshape(-1, 3, 3)
    val_flat = val_all.reshape(-1)

    thr2 = threshold * threshold

    def sampson_inliers(E):
        Ex1 = h1 @ E.T  # (T,3) rows: E x1
        Etx2 = h2 @ E  # (T,3) rows: E^T x2
        num = jnp.sum(h2 * Ex1, axis=1)
        den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
        d2 = num * num / jnp.maximum(den, 1e-18)
        return valid & (d2 < thr2)

    inl_all = jax.vmap(sampson_inliers)(Es_flat)  # (K*10, T)
    counts = jnp.where(val_flat, jnp.sum(inl_all, axis=1), -1)
    best = jnp.argmax(counts)
    # project the winner onto the essential manifold and re-score
    U, _, Vt2 = jnp.linalg.svd(Es_flat[best])
    E_best = U @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0], dtype)) @ Vt2
    inl = sampson_inliers(E_best)
    ok = n_tracked >= 5
    inl = inl & ok
    return Ransac5Result(E=E_best, inliers=inl,
                         inlier_count=jnp.sum(inl).astype(jnp.int32), ok=ok)


class HybridRansacResult(NamedTuple):
    inliers: jnp.ndarray  # (T,) bool final inlier set (False everywhere if skipped)
    score: jnp.ndarray  # () R2 inlier fraction (stationarity score)
    used_r5: jnp.ndarray  # () bool
    skipped: jnp.ndarray  # () bool


def hybrid_ransac(
    cam1: Camera,
    cam2: Camera,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    norm1: jnp.ndarray,
    norm2: jnp.ndarray,
    valid: jnp.ndarray,
    rng_key,
    pt_params,
    r2_threshold_px: float,
    r5_threshold: float,
) -> HybridRansacResult:
    """Hybrid RANSAC2-vs-RANSAC5 selection (reference: computeHybridRansac,
    ransac_pipeline.cpp:158-195): R2 always runs (its score = stationarity);
    R5 is skipped when R2 inliers > ransac2InliersToSkipRansac5 * n; both are
    invalidated below ransacMinInlierFraction; with both valid, R2 wins if its
    count > ransac2InliersOverRansac5Needed * R5's."""
    k2, k5 = jax.random.split(rng_key)
    r2 = ransac2(cam1, cam2, pts1, pts2, valid, k2, r2_threshold_px,
                 max_iters=ROT_RANSAC_MAX_ITERS)
    n = jnp.maximum(jnp.sum(valid), 1)
    r2_done = jnp.sum(valid) >= 2

    use_r2_inliers = r2.inlier_count > pt_params.ransac2InliersToSkipRansac5 * n
    # hypothesis count = the reference's latency-bounding iteration cap
    # (reference: ptsetreg.hpp:43-44 maxIters control, tracker.ransacMaxIters);
    # the adaptive early-exit becomes a static vmapped batch on TPU
    r5 = ransac5(norm1, norm2, valid, k5, r5_threshold,
                 max_iters=max(int(pt_params.ransacMaxIters), 8))
    r5_done = r5.ok & ~use_r2_inliers

    dtype = pts1.dtype
    r5_frac = r5.inlier_count / n.astype(dtype)
    r2_frac = r2.inlier_count / n.astype(dtype)
    r5_done = r5_done & (r5_frac >= pt_params.ransacMinInlierFraction)
    r2_done = r2_done & (r2_frac >= pt_params.ransacMinInlierFraction)

    pick_r2 = r2_done & (
        ~r5_done
        | use_r2_inliers
        | (r2.inlier_count > pt_params.ransac2InliersOverRansac5Needed * r5.inlier_count)
    )
    pick_r5 = r5_done & ~pick_r2
    skipped = ~pick_r2 & ~pick_r5
    inliers = jnp.where(pick_r2, r2.inliers, jnp.where(pick_r5, r5.inliers, False))
    return HybridRansacResult(
        inliers=inliers, score=r2.score, used_r5=pick_r5, skipped=skipped)


class Ransac3Result(NamedTuple):
    R: jnp.ndarray  # (3,3) prev->cur rigid rotation
    t: jnp.ndarray  # (3,)
    inliers: jnp.ndarray  # (T,) bool
    inlier_count: jnp.ndarray  # () int32
    ok: jnp.ndarray  # () bool


def ransac3(
    prev_pts3d: jnp.ndarray,
    cur_pts3d: jnp.ndarray,
    cur_norm: jnp.ndarray,
    valid: jnp.ndarray,
    rng_key,
    error_thresh: float = 1e-4,
    max_iters: int = 128,
) -> Ransac3Result:
    """Stereo 2D-3D absolute-pose RANSAC (reference: doRansac3,
    ransac_pipeline.cpp:218-272, wrapping Theia EstimateCalibratedAbsolutePose
    on stereo-triangulated previous-frame points).

    TPU redesign: with stereo, BOTH frames have triangulated 3D points, so the
    minimal solver becomes 3-point rigid alignment (Kabsch) — trivially
    vmappable, unlike P3P's quartic — while the inlier metric stays the
    reference's: squared NORMALIZED reprojection error of the transformed
    previous point against the current 2D feature < error_thresh.

    prev_pts3d/cur_pts3d: (T,3) camera-frame points (prev/cur cam0);
    cur_norm: (T,2) current normalized image points; valid: (T,).
    """
    dtype = prev_pts3d.dtype
    T = prev_pts3d.shape[0]
    n = jnp.sum(valid)
    order = jnp.argsort(~valid, stable=True)
    k1, _ = jax.random.split(rng_key)
    idx = jax.random.randint(k1, (max_iters, 3), 0, jnp.maximum(n, 1))
    slots = order[idx]  # (K,3)

    def solve(sl):
        a = prev_pts3d[sl]  # (3,3)
        b = cur_pts3d[sl]
        ca = jnp.mean(a, axis=0)
        cb = jnp.mean(b, axis=0)
        # Horn quaternion solve (SVD-free; 128 vmapped 3x3 SVDs dominate the
        # stereo RANSAC cost otherwise)
        R = _kabsch(a - ca, b - cb, jnp.ones((3,), dtype))
        t = cb - R @ ca
        return R, t

    Rs, ts = jax.vmap(solve)(slots)

    def count(R, t):
        p = prev_pts3d @ R.T + t  # (T,3)
        z = p[:, 2]
        okz = z > 1e-6
        proj = p[:, :2] / jnp.where(okz, z, 1.0)[:, None]
        e2 = jnp.sum((proj - cur_norm) ** 2, axis=1)
        return valid & okz & (e2 < error_thresh)

    inl_all = jax.vmap(count)(Rs, ts)
    counts = jnp.sum(inl_all, axis=1)
    distinct = (slots[:, 0] != slots[:, 1]) & (slots[:, 1] != slots[:, 2]) & (slots[:, 0] != slots[:, 2])
    counts = jnp.where(distinct, counts, -1)
    best = jnp.argmax(counts)
    R_best, t_best = Rs[best], ts[best]

    # refit on inliers (least-squares Kabsch over the inlier set)
    inl0 = inl_all[best]
    w = inl0.astype(dtype)
    sw = jnp.maximum(jnp.sum(w), 1.0)
    ca = jnp.sum(prev_pts3d * w[:, None], axis=0) / sw
    cb = jnp.sum(cur_pts3d * w[:, None], axis=0) / sw
    R_fit = _kabsch(prev_pts3d - ca, cur_pts3d - cb, w)
    t_fit = cb - R_fit @ ca
    enough = jnp.sum(inl0) >= 3
    R_f = jnp.where(enough, R_fit, R_best)
    t_f = jnp.where(enough, t_fit, t_best)

    def count2(R, t):
        p = prev_pts3d @ R.T + t
        z = p[:, 2]
        okz = z > 1e-6
        proj = p[:, :2] / jnp.where(okz, z, 1.0)[:, None]
        e2 = jnp.sum((proj - cur_norm) ** 2, axis=1)
        return valid & okz & (e2 < error_thresh)

    inl = count2(R_f, t_f)
    ok = n >= 3
    inl = inl & ok
    return Ransac3Result(R=R_f, t=t_f, inliers=inl,
                         inlier_count=jnp.sum(inl).astype(jnp.int32), ok=ok)


class UprightRansacResult(NamedTuple):
    yaw: jnp.ndarray  # ()
    t: jnp.ndarray  # (3,)
    inliers: jnp.ndarray  # (T,)
    inlier_count: jnp.ndarray  # () int32
    ok: jnp.ndarray


def _solve_upright_2p(p1, p2, d1, d2, dtype):
    """Closed-form gravity-aligned 2-point pose: find yaw about +z and t with
    Rz(yaw) p_i + t = s_i d_i (reference: stereo_upright_2p.cpp wrapping Theia
    TwoPointPosePartialRotation about axis (0,0,1)).

    Eliminating t: Rz(yaw)(p2-p1) = s2 d2 - s1 d1. The z row is linear in
    (s1, s2); the xy-norm gives a quadratic; yaw follows from the xy parts.
    Returns (yaw (2,), t (2,3), valid (2,)) for the two quadratic roots.
    """
    v = p2 - p1
    vz = v[2]
    vxy2 = v[0] * v[0] + v[1] * v[1]
    # s2 * d2z - s1 * d1z = vz  ->  parametrize s2 = (vz + s1 d1z) / d2z
    d2z = jnp.where(jnp.abs(d2[2]) > 1e-9, d2[2], 1e-9)
    # |s2 d2xy - s1 d1xy|^2 = vxy2: quadratic a s1^2 + b s1 + c = 0
    # with s2 = alpha + beta s1, alpha = vz/d2z, beta = d1z/d2z
    alpha = v[2] / d2z
    beta = d1[2] / d2z
    exy = lambda w: jnp.asarray([w[0], w[1]], dtype)
    d1xy = exy(d1)
    d2xy = exy(d2)
    u = alpha * d2xy  # constant part of (s2 d2 - s1 d1)_xy
    w = beta * d2xy - d1xy  # s1 coefficient
    a = jnp.dot(w, w)
    b = 2 * jnp.dot(u, w)
    c = jnp.dot(u, u) - vxy2
    disc = b * b - 4 * a * c
    valid = (disc >= 0) & (jnp.abs(a) > 1e-12)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    s1s = jnp.stack([(-b + sq), (-b - sq)]) / (2 * jnp.where(jnp.abs(a) > 1e-12, a, 1.0))
    s2s = alpha + beta * s1s

    def yaw_t(s1, s2):
        rhs = s2 * d2 - s1 * d1  # = Rz(yaw) v
        yaw = jnp.arctan2(rhs[1], rhs[0]) - jnp.arctan2(v[1], v[0])
        cy, sy = jnp.cos(yaw), jnp.sin(yaw)
        Rz = jnp.asarray([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]], dtype)
        t = s1 * d1 - Rz @ p1
        return yaw, t

    yaws, ts = jax.vmap(yaw_t)(s1s, s2s)
    return yaws, ts, valid & (s1s > 0) & (s2s > 0)


def stereo_upright_2p(
    prev_pts3d: jnp.ndarray,
    cur_rays: jnp.ndarray,
    valid: jnp.ndarray,
    rng_key,
    error_thresh: float = 1e-4,
    max_iters: int = 128,
    world_to_cam: jnp.ndarray = None,
    cur_norm: jnp.ndarray = None,
) -> UprightRansacResult:
    """Gravity-aligned 2-point pose RANSAC (reference: stereo_upright_2p.cpp):
    previous-frame stereo-triangulated 3D points (GRAVITY-ALIGNED world
    coordinates, z = gravity axis) vs current bearing rays (same world
    coordinates); solves yaw + translation.

    Inlier metric: squared normalized reprojection error of Rz p + t against
    the current ray's normalized point. When world_to_cam (the current
    frame's 3x3 world-to-camera rotation) and cur_norm (the raw normalized
    current pixels) are given, the error is evaluated in the current CAMERA
    frame exactly like the reference (stereo_upright_2p.cpp:72-81
    UprightEstimator::Error with worldToCamera = R1^-1); otherwise the world
    frame doubles as the camera frame."""
    dtype = prev_pts3d.dtype
    T = prev_pts3d.shape[0]
    n = jnp.sum(valid)
    order = jnp.argsort(~valid, stable=True)
    k1, _ = jax.random.split(rng_key)
    idx = jax.random.randint(k1, (max_iters, 2), 0, jnp.maximum(n, 1))
    slots = order[idx]

    if cur_norm is None:
        cur_norm = cur_rays[:, :2] / jnp.where(
            jnp.abs(cur_rays[:, 2:3]) > 1e-9, cur_rays[:, 2:3], 1e-9)

    def hypo(sl):
        yaws, ts, ok = _solve_upright_2p(
            prev_pts3d[sl[0]], prev_pts3d[sl[1]],
            cur_rays[sl[0]], cur_rays[sl[1]], dtype)

        def count(yaw, t, okk):
            cy, sy = jnp.cos(yaw), jnp.sin(yaw)
            Rz = jnp.asarray([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]], dtype)
            p = prev_pts3d @ Rz.T + t
            if world_to_cam is not None:
                p = p @ world_to_cam.T
            z = p[:, 2]
            okz = z > 1e-6
            proj = p[:, :2] / jnp.where(okz, z, 1.0)[:, None]
            e2 = jnp.sum((proj - cur_norm) ** 2, axis=1)
            inl = valid & okz & (e2 < error_thresh)
            return jnp.where(okk, jnp.sum(inl), -1), inl

        counts, inls = jax.vmap(count)(yaws, ts, ok)
        best = jnp.argmax(counts)
        return counts[best], inls[best], yaws[best], ts[best]

    counts, inls, yaws, ts = jax.vmap(hypo)(slots)
    distinct = slots[:, 0] != slots[:, 1]
    counts = jnp.where(distinct, counts, -1)
    best = jnp.argmax(counts)
    ok = n >= 2
    inl = inls[best] & ok
    return UprightRansacResult(
        yaw=yaws[best], t=ts[best], inliers=inl,
        inlier_count=jnp.sum(inl).astype(jnp.int32), ok=ok)
