"""Loop-closure geometric verification: 3D-3D similarity RANSAC, TPU-native.

The reference verifies DBoW2 loop candidates with a RANSAC over matched map
points and gates the implied drift (reference parameters:
slam.loopClosureRansacIterations / loopClosureInlierThreshold /
loopClosureRansacMinInliers / loopClosureRansacFixScale / maximumDrift*,
codegen/parameter_definitions.c:369-388; module source not in snapshot).

Redesign: all hypotheses run as ONE vmapped batch (matching the front-end
RANSAC design, frontend/ransac.py): each hypothesis draws 3 correspondences,
solves the closed-form Kabsch/Umeyama alignment (3x3 SVD), counts inliers
within the threshold, and the best model is refit on its inliers.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _kabsch(src, dst, w, with_scale):
    """Weighted similarity dst ~ s R src + t. src/dst (M,3), w (M,)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    xs = src - mu_s
    xd = dst - mu_d
    C = (xd * w[:, None]).T @ xs / wsum
    U, S, Vt = jnp.linalg.svd(C)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 0.0], C.dtype) + jnp.asarray([0.0, 0.0, 1.0], C.dtype) * d)
    R = U @ D @ Vt
    var_s = jnp.sum(w[:, None] * xs * xs) / wsum
    s = jnp.where(with_scale,
                  jnp.sum(S * jnp.diagonal(D)) / jnp.maximum(var_s, 1e-12),
                  1.0)
    t = mu_d - s * (R @ mu_s)
    return R, t, s


@partial(jax.jit, static_argnames=("n_hyp", "with_scale"))
def ransac_similarity(src, dst, valid, key, n_hyp: int = 100,
                      threshold: float = 0.1, with_scale: bool = False):
    """RANSAC dst ~ s R src + t over (M,3) correspondences with validity mask.

    Returns (R (3,3), t (3,), s (), inlier_mask (M,), n_inliers ()).
    """
    M = src.shape[0]
    dtype = src.dtype
    nv = jnp.maximum(jnp.sum(valid), 1)

    def hypothesis(k):
        # draw 3 correspondences among valid; duplicated indices make the
        # Kabsch fit underdetermined (a 2-point sample has a free rotation
        # axis), so such hypotheses score as -1 like frontend ransac5 does
        idx = jax.random.randint(k, (3,), 0, nv)
        order = jnp.argsort(~valid)  # valid entries first, stable
        sel = order[idx]
        distinct = jnp.sum(sel[:, None] == sel[None, :]) == 3
        w3 = jnp.ones(3, dtype)
        R, t, s = _kabsch(src[sel], dst[sel], w3, with_scale)
        pred = s * (src @ R.T) + t
        err = jnp.linalg.norm(pred - dst, axis=-1)
        inl = (err < threshold) & valid
        return jnp.where(distinct, jnp.sum(inl), -1), (R, t, s)

    keys = jax.random.split(key, n_hyp)
    scores, models = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(scores)
    R, t, s = jax.tree_util.tree_map(lambda m: m[best], models)

    # refit on inliers of the best model
    pred = s * (src @ R.T) + t
    inl = (jnp.linalg.norm(pred - dst, axis=-1) < threshold) & valid
    w = inl.astype(dtype)
    R2, t2, s2 = _kabsch(src, dst, w, with_scale)
    pred2 = s2 * (src @ R2.T) + t2
    inl2 = (jnp.linalg.norm(pred2 - dst, axis=-1) < threshold) & valid
    # keep the refit only if it did not lose inliers
    better = jnp.sum(inl2) >= jnp.sum(inl)
    R = jnp.where(better, R2, R)
    t = jnp.where(better, t2, t)
    s = jnp.where(better, s2, s)
    inl = jnp.where(better, inl2, inl)
    return R, t, s, inl, jnp.sum(inl)


def _dlt_pose(pts3, obs2, w):
    """Weighted DLT for M = [R|t] (world->camera, normalized pinhole):
    obs2 ~ project(M [pts3, 1]). pts3 (M,3), obs2 (M,2), w (M,) weights.
    Returns (R, t)."""
    dtype = pts3.dtype
    X = jnp.concatenate([pts3, jnp.ones((pts3.shape[0], 1), dtype)], axis=1)
    z = jnp.zeros_like(X)
    # rows: [X 0 -x X] and [0 X -y X], weighted
    r1 = jnp.concatenate([X, z, -obs2[:, :1] * X], axis=1)
    r2 = jnp.concatenate([z, X, -obs2[:, 1:2] * X], axis=1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    m = Vt[-1].reshape(3, 4)
    # sign: the majority of weighted points must sit in front of the camera
    zc = X @ m[2]
    sgn = jnp.where(jnp.sum(jnp.sign(zc) * w) < 0, -1.0, 1.0)
    m = m * sgn
    # orthonormalize the rotation block; its singular values carry the
    # projective scale of the whole solution
    U, S, Vr = jnp.linalg.svd(m[:, :3])
    d = jnp.sign(jnp.linalg.det(U @ Vr))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 0.0], dtype) + jnp.asarray([0.0, 0.0, 1.0], dtype) * d)
    R = U @ D @ Vr
    scale = jnp.sum(S * jnp.diagonal(D)) / 3.0
    t = m[:, 3] / jnp.maximum(scale, 1e-12)
    return R, t


def _pnp_errors(pts3, obs2, R, t):
    pc = pts3 @ R.T + t
    zc = pc[:, 2]
    proj = pc[:, :2] / jnp.maximum(jnp.abs(zc[:, None]), 1e-9)
    err = jnp.linalg.norm(proj - obs2, axis=-1)
    return jnp.where(zc > 1e-6, err, jnp.inf)


@partial(jax.jit, static_argnames=("n_hyp",))
def ransac_pnp(pts3, obs2, valid, key, n_hyp: int = 100,
               threshold: float = 0.02):
    """RANSAC perspective-n-point: world->camera pose from 3D map points and
    their 2D NORMALIZED observations (the 2D-3D loop-closure fallback —
    the fresh side of a revisit has observations before it has structure).

    Hypotheses are one vmapped batch (same design as ransac_similarity):
    each draws 6 correspondences, solves the 11-DOF DLT, scores by
    normalized reprojection error with cheirality. The best model is refit
    by a weighted DLT on its inliers. Returns (R (3,3), t (3,),
    inlier_mask (M,), n_inliers ())."""
    dtype = pts3.dtype
    nv = jnp.maximum(jnp.sum(valid), 1)

    def hypothesis(k):
        idx = jax.random.randint(k, (6,), 0, nv)
        order = jnp.argsort(~valid)
        sel = order[idx]
        distinct = jnp.sum(sel[:, None] == sel[None, :]) == 6
        R, t = _dlt_pose(pts3[sel], obs2[sel], jnp.ones(6, dtype))
        err = _pnp_errors(pts3, obs2, R, t)
        inl = (err < threshold) & valid
        return jnp.where(distinct, jnp.sum(inl), -1), (R, t)

    keys = jax.random.split(key, n_hyp)
    scores, models = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(scores)
    R, t = jax.tree_util.tree_map(lambda m: m[best], models)

    inl = (_pnp_errors(pts3, obs2, R, t) < threshold) & valid
    R2, t2 = _dlt_pose(pts3, obs2, inl.astype(dtype))
    inl2 = (_pnp_errors(pts3, obs2, R2, t2) < threshold) & valid
    better = jnp.sum(inl2) >= jnp.sum(inl)
    R = jnp.where(better, R2, R)
    t = jnp.where(better, t2, t)
    inl = jnp.where(better, inl2, inl)
    return R, t, inl, jnp.sum(inl)


def ransac_pnp_np(pts3, obs2, seed: int = 0, n_hyp: int = 100,
                  threshold: float = 0.02, pad: int = 256):
    """Host wrapper for ransac_pnp (pads to static shapes for jit reuse)."""
    pts3 = np.asarray(pts3, np.float64)
    obs2 = np.asarray(obs2, np.float64)
    M = pts3.shape[0]
    P = pad
    while P < M:
        P *= 2
    pp = np.zeros((P, 3)); pp[:M] = pts3
    op = np.zeros((P, 2)); op[:M] = obs2
    vp = np.zeros(P, bool); vp[:M] = True
    from .host import cpu_device

    with jax.default_device(cpu_device()):
        key = jax.random.PRNGKey(seed)
        R, t, inl, n = ransac_pnp(jnp.asarray(pp), jnp.asarray(op),
                                  jnp.asarray(vp), key, n_hyp=n_hyp,
                                  threshold=threshold)
    return np.asarray(R), np.asarray(t), np.asarray(inl)[:M], int(n)


def ransac_similarity_np(src, dst, seed: int = 0, n_hyp: int = 100,
                         threshold: float = 0.1, with_scale: bool = False,
                         pad: int = 256):
    """Host wrapper: pads to a static correspondence count for jit reuse."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    M = src.shape[0]
    P = pad
    while P < M:
        P *= 2
    sp = np.zeros((P, 3)); sp[:M] = src
    dp = np.zeros((P, 3)); dp[:M] = dst
    vp = np.zeros(P, bool); vp[:M] = True
    # host CPU execution: loop-closure verification is keyframe-rate with
    # tiny shapes (see slam/host.py)
    from .host import cpu_device

    with jax.default_device(cpu_device()):
        key = jax.random.PRNGKey(seed)
        R, t, s, inl, n = ransac_similarity(
            jnp.asarray(sp), jnp.asarray(dp), jnp.asarray(vp), key,
            n_hyp=n_hyp, threshold=threshold, with_scale=with_scale)
    return (np.asarray(R), np.asarray(t), float(s),
            np.asarray(inl)[:M], int(n))
