"""Kalman filter updates: generic update, ZUPT family, visual track update.

Port of the reference update machinery (reference: src/odometry/ekf.cpp:24-85,
573-693, 760-844) with one structural change: all measurement matrices are
FULL-WIDTH (n x d) fixed-shape arrays with row-validity expressed by zeroed H
rows / residuals (instead of the reference's column-truncated H). Zeroed rows
provably do not change the update (their Kalman gain columns vanish and S
stays block diagonal), which lets variable-length visual tracks run as one
static-shape XLA program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .chi2 import CHI2INV95
from .sqrt import sr_add_diag_noise, sr_innovation_chi2, sr_update
from .state import BGA, CAM, ORI, POS, POSE_DIM, SFT, VEL, EKFState

# Covariance algebra must not drop mantissa bits on the TPU MXU (bf16 passes
# corrupt P into indefiniteness); these sites run at Precision.HIGHEST even
# when the rest of the program (image front-end) uses the fast default.
_PREC = jax.lax.Precision.HIGHEST

# Visual-update covariance downdate form, measured on the textured mono
# probe (CPU f32 ATE) and the high-noise blob stress test
# (tests/test_precision.py::test_f32_matches_f64):
#   plain P - K'HP (round 2):     texture CHAOTIC 0.126-0.188 m across
#                                 matmul-precision modes
#   plain + symmetrize (DEFAULT): texture 0.146 m CPU / 0.095-0.136 m TPU
#                                 across modes, stress test passes
#   Joseph (I-KH)P(I-KH)'+K R K': texture 0.088 m (best) but DIVERGES the
#                                 stress test: P's diagonal spans 1e-8..1e8
#                                 (uninitialized trail poses hold 1e8 prior
#                                 variance), and the dense triple product's
#                                 f32 absolute error ~|P|_max*eps drives P
#                                 indefinite within 10 frames — even with
#                                 diagonal equilibration. Safe only with a
#                                 bounded-dynamic-range P (sqrt/UD filter
#                                 territory); kept behind this flag.
#   f64:                          texture 0.048 m (reference anchor: the C++
#                                 filter runs f64 Joseph + symmetrization,
#                                 ekf.cpp:848-885,1024-1067)
JOSEPH_FORM = False


def pdot(a, b):
    return jnp.matmul(a, b, precision=_PREC)


def _normalize_current_quat(m):
    q = m[ORI : ORI + 4]
    return m.at[ORI : ORI + 4].set(q / jnp.linalg.norm(q))


def normalize_quaternions(m, cam_pose_count: int):
    """Normalize the current + all trail quaternions; zero quats stay zero
    (reference: ekf.cpp:1024-1032)."""
    m = _normalize_current_quat(m)
    for i in range(cam_pose_count):
        s = CAM + POSE_DIM * i + 3
        q = m[s : s + 4]
        n = jnp.linalg.norm(q)
        m = m.at[s : s + 4].set(jnp.where(n > 0, q / jnp.where(n > 0, n, 1.0), q))
    return m


def solve_innovation(S, B):
    """Solve S X = B for the innovation covariance S via Cholesky.

    The reference uses LDLT (ekf.cpp:66). Cholesky NaNs when accumulated f32
    rounding pushes S indefinite — rather than a slower decomposition, the
    callers detect the non-finite result and DROP that update (the filter
    survives; the reference's chi2 gate rejects such updates similarly)."""
    cho = jax.scipy.linalg.cho_factor(S)
    return jax.scipy.linalg.cho_solve(cho, B)


def kf_update(m, P, y, H, r_diag, sqrt_mode: bool = False):
    """Generic KF update with diagonal measurement noise.

    H: (n, d) full width; rows may be all-zero (masked). y: (n,) with masked
    rows equal to (H m) rows (zero residual). r_diag: (n,) positive.
    Returns (m, P). Mirrors the reference's `update` (ekf.cpp:57-82) +
    updateCommon. An update whose result would be non-finite is dropped
    (state returned unchanged) — a single degenerate S must not destroy the
    filter.

    sqrt_mode (static): P holds the square-root factor W (P = W W^T, see
    ekf/sqrt.py); the update runs as one triangular pre-array QR.
    """
    v = y - pdot(H, m[:, None])[:, 0]
    if sqrt_mode:
        m_new, P_new, _ = sr_update(m, P, v, H, jnp.sqrt(r_diag).astype(P.dtype))
    else:
        HP = pdot(H, P)  # (n, d)
        S = pdot(HP, H.T) + jnp.diag(r_diag)
        K = solve_innovation(S, HP)  # (n, d); true gain is K.T
        m_new = m + pdot(K.T, v[:, None])[:, 0]
        P_new = P - pdot(K.T, HP)
    ok = jnp.isfinite(m_new).all() & jnp.isfinite(P_new).all()
    m = jnp.where(ok, m_new, m)
    P = jnp.where(ok, P_new, P)
    m = _normalize_current_quat(m)
    return m, P


def _gated(s: EKFState, cond, new_s: EKFState) -> EKFState:
    return jax.tree_util.tree_map(lambda a, b: jnp.where(cond, b, a), s, new_s)


def _block_h(d, offset, n, dtype):
    H = jnp.zeros((n, d), dtype=dtype)
    return H.at[:, offset : offset + n].set(jnp.eye(n, dtype=dtype))


def _maybe_symmetrize(P, sqrt_mode: bool):
    return P if sqrt_mode else 0.5 * (P + P.T)


def update_zupt(s: EKFState, r, noise_scale, sqrt_mode: bool = False) -> EKFState:
    """Zero-velocity update (reference: ekf.cpp:573-590); rate-limited 0.25s."""
    do = s.time - s.zupt_time >= 0.25
    d = s.m.shape[0]
    H = _block_h(d, VEL, 3, s.m.dtype)
    m, P = kf_update(s.m, s.P, jnp.zeros(3, s.m.dtype), H,
                     jnp.full((3,), r * noise_scale, s.m.dtype), sqrt_mode)
    new = s._replace(m=m, P=P, zupt_time=s.time, was_stationary=jnp.ones((), bool))
    return _gated(s, do, new)


def update_zupt_initialization(s: EKFState, init_zupt_r, noise_scale,
                               sqrt_mode: bool = False) -> EKFState:
    """Decaying init-ZUPT (reference: ekf.cpp:594-611)."""
    do = (~s.was_stationary) & (s.time <= 60.0) & (s.time - s.init_zupt_time >= 0.1)
    d = s.m.shape[0]
    H = _block_h(d, VEL, 3, s.m.dtype)
    r = init_zupt_r * noise_scale * jnp.exp(0.5 * s.time)
    m, P = kf_update(s.m, s.P, jnp.zeros(3, s.m.dtype), H,
                     jnp.full((3,), 1.0, s.m.dtype) * r, sqrt_mode)
    new = s._replace(m=m, P=P, init_zupt_time=s.time)
    return _gated(s, do, new)


def update_zrupt(s: EKFState, xg, rotation_zupt_r, noise_scale,
                 sqrt_mode: bool = False) -> EKFState:
    """Zero-rotation update: gyro bias -> sample (reference: ekf.cpp:614-625)."""
    do = s.time - s.zrupt_time >= 0.25
    d = s.m.shape[0]
    H = _block_h(d, BGA, 3, s.m.dtype)
    m, P = kf_update(s.m, s.P, xg, H,
                     jnp.full((3,), rotation_zupt_r * noise_scale, s.m.dtype),
                     sqrt_mode)
    new = s._replace(m=m, P=P, zrupt_time=s.time)
    return _gated(s, do, new)


def update_pseudo_velocity(s: EKFState, default_speed, r, noise_scale,
                           sqrt_mode: bool = False) -> EKFState:
    """Horizontal speed clamp, rank-1 update (reference: ekf.cpp:628-649)."""
    h = jnp.linalg.norm(s.m[VEL : VEL + 2])
    do = h > 1e-7
    d = s.m.shape[0]
    hh = jnp.where(do, h, 1.0)
    H = jnp.zeros((1, d), s.m.dtype)
    H = H.at[0, VEL : VEL + 2].set(s.m[VEL : VEL + 2] / hh)
    if sqrt_mode:
        v = jnp.asarray([default_speed], s.m.dtype) - h[None]
        r_sqrt = jnp.sqrt(jnp.asarray([r * noise_scale], s.m.dtype))
        m, P, _ = sr_update(s.m, s.P, v, H, r_sqrt)
    else:
        HP = pdot(H, s.P)
        S = pdot(HP, H.T)[0, 0] + r * noise_scale
        K = HP / S  # (1,d)
        m = s.m + K[0] * (default_speed - h)
        P = s.P - pdot(K.T, HP)
    m = _normalize_current_quat(m)
    return _gated(s, do, s._replace(m=m, P=P))


def update_position(s: EKFState, pos, r, noise_scale, sqrt_mode: bool = False) -> EKFState:
    d = s.m.shape[0]
    H = _block_h(d, POS, 3, s.m.dtype)
    m, P = kf_update(s.m, s.P, pos, H,
                     jnp.full((3,), r * noise_scale, s.m.dtype), sqrt_mode)
    P = _maybe_symmetrize(P, sqrt_mode)
    return s._replace(m=m, P=P)


def update_zero_height(s: EKFState, r, noise_scale, sqrt_mode: bool = False) -> EKFState:
    d = s.m.shape[0]
    H = jnp.zeros((1, d), s.m.dtype).at[0, POS + 2].set(1.0)
    m, P = kf_update(s.m, s.P, jnp.zeros(1, s.m.dtype), H,
                     jnp.full((1,), r * noise_scale, s.m.dtype), sqrt_mode)
    P = _maybe_symmetrize(P, sqrt_mode)
    return s._replace(m=m, P=P)


def update_orientation(s: EKFState, q, r, noise_scale, cam_pose_count: int,
                       sqrt_mode: bool = False) -> EKFState:
    d = s.m.shape[0]
    H = _block_h(d, ORI, 4, s.m.dtype)
    m, P = kf_update(s.m, s.P, q, H,
                     jnp.full((4,), r * noise_scale, s.m.dtype), sqrt_mode)
    m = normalize_quaternions(m, cam_pose_count)
    P = _maybe_symmetrize(P, sqrt_mode)
    return s._replace(m=m, P=P)


# --- visual track update ---

class VisualUpdateResult(NamedTuple):
    m: jnp.ndarray
    P: jnp.ndarray
    is_inlier: jnp.ndarray  # () bool: passed chi2 + rmse gates
    rmse_ok: jnp.ndarray
    chi2_ok: jnp.ndarray
    chi2_value: jnp.ndarray


def visual_track_update(
    m,
    P,
    H,
    f,
    y,
    mask,
    visual_r,
    noise_scale,
    chi_outlier_r,
    rmse_threshold,
    apply_update=True,
    sqrt_mode: bool = False,
):
    """Masked visual track update with chi2/RMSE outlier gating.

    H: (n, d) Jacobian with invalid rows zeroed; f: (n,) predicted track;
    y: (n,) measured track; mask: (n,) bool row validity.
    visual_r: scalar noise std-like parameter (reference: visualR/focalLength).
    chi_outlier_r / rmse_threshold < 0 disable the respective gate.

    Mirrors visualTrackOutlierCheck + updateVisualTrack
    (reference: ekf.cpp:760-844). Returns updated (m, P) only when the gates
    pass AND apply_update; always returns gate outcomes.

    sqrt_mode (static): P holds the factor W (ekf/sqrt.py); gate + update run
    on the factor and the returned P is the updated factor.
    """
    dtype = m.dtype
    n = H.shape[0]
    maskf = mask.astype(dtype)
    H = H * maskf[:, None]
    v = (y - f) * maskf
    n_valid = jnp.sum(mask)

    # RMSE gate
    rmse2 = jnp.sum(v * v) / jnp.maximum(n_valid, 1)
    rmse_ok = jnp.where(rmse_threshold >= 0, rmse2 <= rmse_threshold * rmse_threshold, True)

    # chi2 gate uses its own noise level chi_outlier_r (reference passes
    # chiOutlierR to visualTrackOutlierCheck and visualR to updateVisualTrack,
    # backend.cpp:1155-1187) and the reference's noiseScale correction
    # (ekf.cpp:808-819)
    r_gate = (chi_outlier_r * chi_outlier_r) * noise_scale
    if sqrt_mode:
        chi2_value = noise_scale * sr_innovation_chi2(P, H, v, jnp.abs(r_gate))
    else:
        HP = pdot(H, P)
        HPHt = pdot(HP, H.T)
        eye = jnp.eye(n, dtype=dtype)
        S_gate = HPHt + jnp.abs(r_gate) * eye
        Sv = solve_innovation(S_gate, v[:, None])[:, 0]
        # a non-finite chi2 (degenerate S) must reject, not pass
        Sv = jnp.where(jnp.isfinite(Sv), Sv, jnp.inf)
        chi2_value = noise_scale * jnp.dot(Sv, v)
    idx = jnp.minimum(n_valid, len(CHI2INV95) - 1)
    chi2_thresh = jnp.asarray(CHI2INV95, dtype=dtype)[idx]
    chi2_ok = jnp.where(chi_outlier_r >= 0, chi2_value <= chi2_thresh, True)

    is_inlier = rmse_ok & chi2_ok & (n_valid > 0)

    r = (visual_r * visual_r) * noise_scale
    if sqrt_mode:
        r_sqrt = jnp.full((n,), jnp.sqrt(r), dtype)
        m_new, P_new, _ = sr_update(m, P, v, H, r_sqrt)
        m_new = _normalize_current_quat(m_new)
        do = (is_inlier & apply_update
              & jnp.isfinite(m_new).all() & jnp.isfinite(P_new).all())
        m_out = jnp.where(do, m_new, m)
        P_out = jnp.where(do, P_new, P)
        return VisualUpdateResult(m_out, P_out, is_inlier, rmse_ok, chi2_ok,
                                  chi2_value)
    S = HPHt + r * eye
    K = solve_innovation(S, HP)  # (n,d)
    m_new = m + pdot(K.T, v[:, None])[:, 0]
    if JOSEPH_FORM:
        # EQUILIBRATED Joseph: P's diagonal spans ~1e-6..1e6+ (uninitialized
        # trail/map blocks sit at large prior variance), and the raw triple
        # product (I-KH) P (I-KH)' mixes those scales — f32 absolute error
        # ~|P|_max * eps drove P indefinite within 10 frames on the blob
        # stress test (tests/test_precision.py). Normalizing by
        # D = diag(sqrt(P_ii)) puts the product's operands at O(1)
        # (P_n has unit diagonal, |P_n_ij| <= 1), so the same f32 matmuls
        # are ~1e-7 RELATIVE. P+ = D (M P_n M') D + r K'K with
        # M = I - D^-1 K' H D.
        s = jnp.sqrt(jnp.clip(jnp.diag(P), 1e-12, None))
        Pn = P / (s[:, None] * s[None, :])
        M = jnp.eye(P.shape[0], dtype=dtype) - pdot(K.T * (1.0 / s)[:, None],
                                                    H * s[None, :])
        P_new = (pdot(pdot(M, Pn), M.T) * (s[:, None] * s[None, :])
                 + r * pdot(K.T, K))
    else:
        P_new = P - pdot(K.T, HP)
    P_new = 0.5 * (P_new + P_new.T)
    m_new = _normalize_current_quat(m_new)

    do = (is_inlier & apply_update
          & jnp.isfinite(m_new).all() & jnp.isfinite(P_new).all())
    m_out = jnp.where(do, m_new, m)
    P_out = jnp.where(do, P_new, P)
    return VisualUpdateResult(m_out, P_out, is_inlier, rmse_ok, chi2_ok, chi2_value)


def visual_track_gate(m, P, H, f, y, mask, noise_scale, chi_outlier_r,
                      rmse_threshold, sqrt_mode: bool = False):
    """Chi2 + RMSE outlier gates only (no update); used by the batched visual
    update where all tracks are gated against the same pre-update state
    (reference: batchVisualUpdate mode, backend.cpp:1005-1010,1170-1187).
    Returns (is_inlier, chi2_value). Batches over leading dims via vmap.
    """
    dtype = m.dtype
    n = H.shape[0]
    maskf = mask.astype(dtype)
    H = H * maskf[:, None]
    v = (y - f) * maskf
    n_valid = jnp.sum(mask)

    rmse2 = jnp.sum(v * v) / jnp.maximum(n_valid, 1)
    rmse_ok = jnp.where(rmse_threshold >= 0, rmse2 <= rmse_threshold * rmse_threshold, True)

    r_gate = (chi_outlier_r * chi_outlier_r) * noise_scale
    if sqrt_mode:
        chi2_value = noise_scale * sr_innovation_chi2(P, H, v, jnp.abs(r_gate))
    else:
        S = pdot(pdot(H, P), H.T) + jnp.abs(r_gate) * jnp.eye(n, dtype=dtype)
        Sv = solve_innovation(S, v[:, None])[:, 0]
        Sv = jnp.where(jnp.isfinite(Sv), Sv, jnp.inf)
        chi2_value = noise_scale * jnp.dot(Sv, v)
    idx = jnp.minimum(n_valid, len(CHI2INV95) - 1)
    chi2_ok = jnp.where(chi_outlier_r >= 0, chi2_value <= jnp.asarray(CHI2INV95, dtype=dtype)[idx], True)
    return rmse_ok & chi2_ok & (n_valid > 0), chi2_value
