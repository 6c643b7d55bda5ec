"""Multi-view triangulation + visual-update measurement model.

TPU-native redesign of the reference triangulator (reference:
src/odometry/triangulation.cpp). The math is the same — two-camera midpoint
initialization, Gauss-Newton refinement in inverse-depth coordinates, linear
(Szeliski-style) variant, reprojection measurement model — but the ~900 lines
of hand-derived sensitivities (derivatives of the GN *iteration path* w.r.t.
every pose, pseudo-inverse derivatives, time-shift chain rules) are replaced
by jax.jacfwd through the same computation graph, which yields identical
derivatives by construction.

All functions are mask-based and fixed-shape: a track over n <= N poses is
stored in (N, ...) arrays with a validity mask, so one XLA program serves all
track lengths.

Conventions: a camera pose is (p, R) with p = camera position in world and
R = world-to-camera rotation, derived from an IMU pose state [pos(3), quat(4)]
via R = icr @ quat_to_rmat(q), p = pos - R^T @ baseline
(reference: extractCameraPoseTrail, triangulation.cpp:66-103).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.quaternion import quat_to_rmat

# triangulation status codes (reference: src/odometry/output.hpp:15-24)
TRI_OK = 0
TRI_NO_CONVERGENCE = 1
TRI_BAD_COND = 2
TRI_BEHIND = 3
TRI_UNKNOWN_PROBLEM = 4
TRI_BAD_DEPTH = 5
TRI_HYBRID = 6


class CameraPoses(NamedTuple):
    """Trail of camera poses as arrays: p (N,3) world position, R (N,3,3)
    world-to-camera rotation."""

    p: jnp.ndarray
    R: jnp.ndarray


def camera_poses_from_states(pose_states: jnp.ndarray, imu_to_camera: jnp.ndarray) -> CameraPoses:
    """IMU pose states (N,7) [pos,quat] -> camera poses.

    (reference: extractCameraPoseTrail, triangulation.cpp:66-103)
    """
    icr = imu_to_camera[:3, :3]
    baseline = imu_to_camera[:3, 3]
    q = pose_states[..., 3:7]
    R = jnp.einsum("ij,njk->nik", icr, quat_to_rmat(q))
    p = pose_states[..., :3] - jnp.einsum("nji,j->ni", R, baseline)
    return CameraPoses(p=p, R=R)


def inverse_depth(pf: jnp.ndarray) -> jnp.ndarray:
    """[x,y,z] -> [x/z, y/z, 1/z]; own inverse (reference: triangulation.cpp:1006-1030)."""
    return jnp.stack([pf[..., 0], pf[..., 1], jnp.ones_like(pf[..., 2])], axis=-1) / pf[..., 2:3]


def _solve3_spd_equil(A, b, dtype):
    """x = A^-1 b for PSD 3x3 A: Jacobi equilibration (unit diagonal) then
    explicit Cholesky. The scaling is exact in real arithmetic; in f32 it
    keeps the factorization accurate on the highly anisotropic near-singular
    systems mono triangulation produces, where unscaled LLT/Cramer fail.
    Singular A yields large/non-finite x, matching an LU solve; the callers'
    non-finite guards and rcond gate handle that case."""
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(A), tiny))
    As = A * s[:, None] * s[None, :]
    bs = b * s
    l11 = jnp.sqrt(jnp.maximum(As[0, 0], tiny))
    l21 = As[0, 1] / l11
    l31 = As[0, 2] / l11
    l22 = jnp.sqrt(jnp.maximum(As[1, 1] - l21 * l21, tiny))
    l32 = (As[1, 2] - l21 * l31) / l22
    l33 = jnp.sqrt(jnp.maximum(As[2, 2] - l31 * l31 - l32 * l32, tiny))
    y1 = bs[0] / l11
    y2 = (bs[1] - l21 * y1) / l22
    y3 = (bs[2] - l31 * y1 - l32 * y2) / l33
    x3 = y3 / l33
    x2 = (y2 - l32 * x3) / l22
    x1 = (y1 - l21 * x2 - l31 * x3) / l11
    return jnp.stack([x1, x2, x3]) * s


def triangulate_two_cameras(p0, R0, p1, R1, ip0, ip1):
    """Midpoint-style 2-view triangulation via 3x2 pseudo-inverse, in the
    coordinates of camera 0 (reference: triangulateWithTwoCameras,
    triangulation.cpp:610-711)."""
    C = R0 @ R1.T
    b = R0 @ (p1 - p0)
    v0 = jnp.concatenate([ip0, jnp.ones_like(ip0[..., :1])], axis=-1)
    v1 = jnp.concatenate([ip1, jnp.ones_like(ip1[..., :1])], axis=-1)
    vn0 = v0 / jnp.linalg.norm(v0, axis=-1, keepdims=True)
    vn1 = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
    A = jnp.stack([vn0, -(C @ vn1)], axis=-1)  # (3,2)
    # pinv via normal equations (A has full column rank in useful geometry)
    AtA = A.T @ A
    s = jnp.linalg.solve(AtA + 1e-300 * jnp.eye(2, dtype=A.dtype), A.T @ b)
    return s[0] * vn0


class TriangulationResult(NamedTuple):
    pf: jnp.ndarray  # (3,) world coordinates
    status: jnp.ndarray  # () int32
    rcond: jnp.ndarray  # () conditioning of the final GN system


def triangulate_gn(
    poses: CameraPoses,
    ips: jnp.ndarray,
    mask: jnp.ndarray,
    gn_iterations: int = 10,
    convergence_threshold: float = 1e-2,
    convergence_r: float = 11.0,
    rcond_threshold: float = 1e-8,
    stereo: bool = False,
):
    """Iterative GN triangulation in inverse-depth coordinates
    (reference: Triangulator::triangulate, triangulation.cpp:120-407).

    poses: camera poses (N entries; for stereo, left poses stacked before
    right poses, N = 2*n). ips: (N,2) normalized image points. mask: (N,) row
    validity (invalid rows must also be invalid in the same pattern the
    reference would skip them). Differentiable w.r.t. poses and ips.
    """
    dtype = ips.dtype
    N = ips.shape[0]
    maskf = mask.astype(dtype)
    n_valid = jnp.sum(mask)

    # initialization: first and "last" valid pose. For stereo the reference
    # uses index n/2-1 (last left-camera pose); here: last valid left index.
    half = N // 2 if stereo else N
    left_mask = mask[:half]
    idx_range = jnp.arange(half)
    ind1 = jnp.max(jnp.where(left_mask, idx_range, -1))
    ind1 = jnp.maximum(ind1, 1)

    p0, R0 = poses.p[0], poses.R[0]
    pf0 = triangulate_two_cameras(
        p0, R0, poses.p[ind1], poses.R[ind1], ips[0], ips[ind1]
    )
    pfi = inverse_depth(pf0)

    R0T = R0.T

    # precompute per-pose quantities (C_i = R_i R0^T, t_i = R_i (p0 - p_i))
    C = jnp.einsum("nij,jk->nik", poses.R, R0T)  # (N,3,3)
    t = jnp.einsum("nij,nj->ni", poses.R, p0[None, :] - poses.p)  # (N,3)

    def gn_step(pfi, C, t, ips, compute_rcond=True):
        """One Gauss-Newton step; returns (pfi_new, J, rcond)."""
        pfiab = jnp.stack([pfi[0], pfi[1], jnp.ones((), dtype=dtype)])
        h = jnp.einsum("nij,j->ni", C, pfiab) + pfi[2] * t  # (N,3)
        h2 = h[:, 2]
        safe_h2 = jnp.where(jnp.abs(h2) > 1e-12, h2, 1.0)
        err = (ips - h[:, :2] / safe_h2[:, None]) * maskf[:, None]  # (N,2)

        ih2sq = 1.0 / (safe_h2 * safe_h2)
        # Jacobian of error w.r.t. pfi: (N,2,3)
        E01 = (-1.0 / safe_h2)[:, None, None] * C[:, :2, :2] + (
            h[:, :2, None] * ih2sq[:, None, None]
        ) * C[:, None, 2, :2]
        E2 = -t[:, :2] / safe_h2[:, None] + h[:, :2] * (ih2sq * t[:, 2])[:, None]
        E = jnp.concatenate([E01, E2[:, :, None]], axis=2) * maskf[:, None, None]

        ETE = jnp.einsum("nij,nik->jk", E, E)
        Eerr = jnp.einsum("nij,ni->j", E, err)
        # explicit 3x3 solve with Jacobi equilibration: naive Cholesky or
        # adjugate solves here measurably degrade f32 mono accuracy on the
        # near-singular small-baseline systems (ATE 0.005 -> 0.13+); scaling
        # to unit diagonal first restores LU-pivoting-level accuracy at a
        # fraction of the cost of the batched LU this sits in otherwise
        delta = _solve3_spd_equil(ETE, Eerr, dtype)
        pfi_new = pfi - delta

        if compute_rcond:
            # rcond of ETE (3x3): ratio of min/max eigenvalue
            eig = jnp.linalg.eigvalsh(ETE)
            rcond = jnp.abs(eig[0]) / jnp.maximum(jnp.abs(eig[-1]), 1e-300)
        else:
            rcond = jnp.zeros((), dtype)
        J = 0.5 * jnp.sum(err * err) / (convergence_r * convergence_r)
        return pfi_new, J, rcond

    # Fixed-point solve OUTSIDE the autodiff graph, then ONE differentiable
    # GN step at the solution (implicit-function differentiation). The
    # reference differentiates the whole iteration path by hand
    # (triangulation.cpp:210-340); at convergence both agree to first order,
    # and the implicit form keeps jit graphs ~10x smaller (this sits inside
    # jacfwd inside a vmapped per-track update).
    C_ng = jax.lax.stop_gradient(C)
    t_ng = jax.lax.stop_gradient(t)
    ips_ng = jax.lax.stop_gradient(ips)

    def gn_body(carry, _):
        pfi, Jprev, converged, rcond = carry
        # rcond is only consumed from the final differentiable step below
        pfi_new, J, rcond_new = gn_step(pfi, C_ng, t_ng, ips_ng,
                                        compute_rcond=False)
        Jd = jnp.abs((J - Jprev) / jnp.where(jnp.abs(J) > 0, J, 1.0))
        # J ~ 0 (perfect fit) counts as converged: the relative criterion is
        # undefined there (the reference never hits this case on real data)
        converged_new = converged | (Jd < convergence_threshold) | (J < 1e-14)
        return (pfi_new, J, converged_new, rcond_new), None

    init = (
        jax.lax.stop_gradient(pfi),
        jnp.asarray(1e10, dtype=dtype),
        jnp.zeros((), dtype=bool),
        jnp.zeros((), dtype=dtype),
    )
    (pfi_star, _, converged, rcond), _ = jax.lax.scan(
        gn_body, init, None, length=gn_iterations - 1)

    # the differentiable step (carries all input sensitivities)
    pfi, _, rcond = gn_step(jax.lax.stop_gradient(pfi_star), C, t, ips)

    pf_c0 = inverse_depth(pfi)
    pf = R0T @ pf_c0 + p0

    # behind-any-camera check (reference: isBehind, triangulation.cpp:53-60)
    z_all = jnp.einsum("nij,nj->ni", poses.R, pf[None, :] - poses.p)[:, 2]
    behind = jnp.any(mask & (z_all < 0))

    status = jnp.where(
        ~converged,
        TRI_NO_CONVERGENCE,
        jnp.where(
            rcond < rcond_threshold,
            TRI_BAD_COND,
            jnp.where(behind, TRI_BEHIND, TRI_OK),
        ),
    ).astype(jnp.int32)
    return TriangulationResult(pf=pf, status=status, rcond=rcond)


def triangulate_linear(poses: CameraPoses, ips: jnp.ndarray, mask: jnp.ndarray):
    """Closed-form linear triangulation (reference: triangulateLinear,
    triangulation.cpp:820-895)."""
    dtype = ips.dtype
    maskf = mask.astype(dtype)
    v = jnp.concatenate([ips, jnp.ones_like(ips[..., :1])], axis=-1)
    vw = jnp.einsum("nji,nj->ni", poses.R, v)  # R^T v: ray in world
    vn = vw / jnp.linalg.norm(vw, axis=-1, keepdims=True)
    A = jnp.eye(3, dtype=dtype)[None] - vn[:, :, None] * vn[:, None, :]
    A = A * maskf[:, None, None]
    S0 = jnp.sum(A, axis=0)
    S1 = jnp.einsum("nij,nj->i", A, poses.p)
    pf = jnp.linalg.solve(S0 + 1e-300 * jnp.eye(3, dtype=dtype), S1)
    z_all = jnp.einsum("nij,nj->ni", poses.R, pf[None, :] - poses.p)[:, 2]
    behind = jnp.any(mask & (z_all < 0))
    status = jnp.where(behind, TRI_BEHIND, TRI_OK).astype(jnp.int32)
    return TriangulationResult(pf=pf, status=status, rcond=jnp.ones((), dtype=dtype))


def triangulate_stereo_fused(poses: CameraPoses, stereo_idp, stereo_cov,
                             stereo_valid):
    """Information-weighted fusion of per-pose PRE-triangulated stereo
    features (reference: Triangulator::triangulateStereo,
    triangulation.cpp:409-608; selected by
    odometry.useIndependentStereoTriangulation, triangulation.cpp:137-138).

    Each trail pose i carries a stereo-triangulated feature in inverse-depth
    coordinates of its own left camera (stereo_idp[i]) plus a 3x3 sensitivity
    covariance (stereo_cov[i], from triangulate_stereo_idp). All are mapped
    into the anchor (head, row 0) camera's idp coordinates and averaged with
    information weights info_i = (J_i cov_i J_i^T)^-1. The whole function is
    differentiable, so prepareVisualUpdate obtains the reference's
    hand-derived dpf/dpose chain by autodiff instead.

    poses: left-camera CameraPoses with N rows (world->cam R, cam origin p).
    Returns TriangulationResult (rcond reports the weight-matrix conditioning).
    """
    dtype = stereo_idp.dtype
    p0, R0 = poses.p[0], poses.R[0]
    eye3 = jnp.eye(3, dtype=dtype)

    def per_pose(p_i, R_i, idp_i, cov_i, v_i):
        f3 = inverse_depth(idp_i)  # own inverse: idp -> cam-i 3D point
        df3 = jax.jacfwd(inverse_depth)(idp_i)
        pos_w = R_i.T @ f3 + p_i
        pos0 = R0 @ (pos_w - p0)
        ipos = inverse_depth(pos0)
        dipos = jax.jacfwd(inverse_depth)(pos0)
        J = dipos @ R0 @ R_i.T @ df3
        cov = J @ cov_i @ J.T
        # reference skips cov.norm() < 1e-10 (MIN_NORM_TO_INVERT); the ridge
        # additionally keeps f32 inversions of anisotropic covs finite
        usable = v_i & (jnp.linalg.norm(cov) >= 1e-10) & jnp.all(jnp.isfinite(cov))
        ridge = (1e-9 * jnp.trace(cov) + jnp.asarray(jnp.finfo(dtype).tiny, dtype))
        info = jnp.linalg.inv(cov + ridge * eye3)
        w = usable.astype(dtype)
        info = jnp.where(jnp.all(jnp.isfinite(info)), info, jnp.zeros_like(info)) * w
        return info @ ipos, info

    ws, infos = jax.vmap(per_pose)(poses.p, poses.R, stereo_idp, stereo_cov,
                                   stereo_valid)
    wsum = jnp.sum(ws, axis=0)
    SW = jnp.sum(infos, axis=0)
    ok_cond = jnp.linalg.norm(SW) >= 1e-10
    SW_safe = SW + jnp.where(ok_cond, 0.0, 1.0) * eye3
    pfi = _solve3_spd_equil(SW_safe, wsum, dtype)
    pf0 = inverse_depth(pfi)
    pf = R0.T @ pf0 + p0
    finite = jnp.all(jnp.isfinite(pf))
    status = jnp.where(ok_cond & finite, TRI_OK, TRI_BAD_COND).astype(jnp.int32)
    # rcond proxy: diagonal anisotropy of the weight matrix
    diag = jnp.diagonal(SW)
    rc = jnp.min(diag) / jnp.maximum(jnp.max(diag), jnp.asarray(jnp.finfo(dtype).tiny, dtype))
    return TriangulationResult(
        pf=jnp.where(finite, pf, jnp.zeros(3, dtype)), status=status, rcond=rc)


def triangulate_stereo_idp(ip_first, ip_second, second_to_first_camera, with_cov=True):
    """(w)Mid2 two-ray closed-form triangulation (BMVC2019) in inverse-depth
    coordinates + 3x3 sensitivity covariance (reference:
    triangulateStereoFeatureIdp, triangulation.cpp:711-818).

    Returns (idp, cov, ok).
    """
    dtype = ip_first.dtype
    f0 = jnp.concatenate([ip_second, jnp.ones_like(ip_second[..., :1])], axis=-1)
    f1 = jnp.concatenate([ip_first, jnp.ones_like(ip_first[..., :1])], axis=-1)
    R = second_to_first_camera[:3, :3]
    tt = second_to_first_camera[:3, 3]

    def pf_fn(f0, f1):
        f0hat = f0 / jnp.linalg.norm(f0)
        f1hat = f1 / jnp.linalg.norm(f1)
        p = jnp.cross(R @ f0hat, f1hat)
        q = jnp.cross(R @ f0hat, tt)
        r = jnp.cross(f1hat, tt)
        pn = jnp.linalg.norm(p)
        qn = jnp.linalg.norm(q)
        rn = jnp.linalg.norm(r)
        lam0 = rn / jnp.maximum(pn, 1e-300)
        w = qn / jnp.maximum(qn + rn, 1e-300)
        pf = w * (tt + lam0 * (R @ f0hat + f1hat))
        return pf, (f0hat, f1hat, lam0, rn, qn, pn)

    pf, (f0hat, f1hat, lam0, rn, qn, pn) = pf_fn(f0, f1)
    lam1 = qn / jnp.maximum(pn, 1e-300)

    l0Rf0 = lam0 * (R @ f0hat)
    l1f1 = lam1 * f1hat
    c0 = jnp.sum((tt + l0Rf0 - l1f1) ** 2)
    c1 = jnp.sum((tt + l0Rf0 + l1f1) ** 2)
    c2 = jnp.sum((tt - l0Rf0 - l1f1) ** 2)
    c3 = jnp.sum((tt - l0Rf0 + l1f1) ** 2)
    ok = c0 <= jnp.minimum(jnp.minimum(c1, c2), c3)

    safe_z = jnp.where(jnp.abs(pf[2]) > 1e-12, pf[2], 1.0)
    idp = jnp.stack([pf[0], pf[1], jnp.ones((), dtype=dtype)]) / safe_z

    if not with_cov:
        return idp, None, ok

    def idp_fn(ips):
        ipf, ips2 = ips[:2], ips[2:]
        ff0 = jnp.concatenate([ips2, jnp.ones(1, dtype=dtype)])
        ff1 = jnp.concatenate([ipf, jnp.ones(1, dtype=dtype)])
        pfx, _ = pf_fn(ff0, ff1)
        return jnp.stack([pfx[0], pfx[1], jnp.ones((), dtype=dtype)]) / pfx[2]

    J = jax.jacfwd(idp_fn)(jnp.concatenate([ip_first, ip_second]))  # (3,4)
    cov = J @ J.T
    return idp, cov, ok
