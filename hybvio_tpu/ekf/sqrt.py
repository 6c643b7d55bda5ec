"""QR-propagated square-root covariance primitives (TPU f32 extension).

The reference keeps the filter healthy in double precision with Joseph-form
updates + symmetrization (reference: src/odometry/ekf.cpp:848-885,1024-1067).
In float32 that breaks down: P's diagonal spans ~1e-8..1e8 (uninitialized
trail poses carry huge prior variance) and dense P algebra has ABSOLUTE error
~|P|_max * eps, which drives P indefinite (measured in ekf/update.py's
downdate comparison). The square-root form bounds the dynamic range: we carry
W with P = W W^T, so W's entries span only the SQUARE ROOT of P's range and
P = W W^T is positive semidefinite by construction — no symmetrization, no
indefiniteness, Joseph-quality updates for free.

TPU-native design: every operation is a QR decomposition (Householder ->
matmuls on the MXU) of a small (d+n) x d array — no scalar recursions (the
classic Bierman/Thornton UD filter is sequential rank-1 scalar work, exactly
what the MXU hates).

Math (standard array square-root Kalman filtering, e.g. Kailath/Sayed/Hassibi
ch. 12):

  predict   P' = F P F^T + G Q G^T
            W' = qr_factor([F W | G sqrt(Q)])

  update    pre-array  M = [[sqrt(R)  H W ]      M M^T = [[S      H P]
                            [   0      W  ]]              [P H^T    P]]
            LQ-factor M = N Q_orth with N lower triangular:
              N = [[S_half    0   ]
                   [  B     W_new ]]
            S_half S_half^T = S,  B = P H^T S_half^{-T},
            W_new W_new^T = P - P H^T S^{-1} H P   (the Joseph-exact posterior)
            gain step: m += B (S_half^{-1} (y - H m))
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def qr_factor(A: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular W (d,d) with W W^T = A A^T, for A of shape (d, k>=d).

    LQ via QR of A^T. Column signs are unconstrained (W W^T is invariant).
    """
    r = jnp.linalg.qr(A.T, mode="r")  # (d, d) upper triangular
    return r.T


def sr_update(m, W, v, H, r_sqrt):
    """One square-root KF update.

    m: (d,) mean; W: (d,d) factor (need not be triangular); v: (n,) residual
    y - H m (masked rows must be 0); H: (n,d) (masked rows all-zero);
    r_sqrt: (n,) per-row measurement noise STANDARD DEVIATION (>0).

    Returns (m_new, W_new, S_half) where S_half is the lower-triangular
    factor of the innovation covariance (for chi^2 use by callers).
    """
    n, d = H.shape
    dtype = W.dtype
    HW = jnp.matmul(H, W, precision=_PREC)  # (n, d)
    pre = jnp.zeros((n + d, n + d), dtype)
    pre = pre.at[:n, :n].set(jnp.diag(r_sqrt))
    pre = pre.at[:n, n:].set(HW)
    pre = pre.at[n:, n:].set(W)
    N = qr_factor(pre)  # (n+d, n+d) lower triangular
    S_half = N[:n, :n]
    B = N[n:, :n]
    W_new = N[n:, n:]
    z = jax.scipy.linalg.solve_triangular(S_half, v, lower=True)
    m_new = m + jnp.matmul(B, z[:, None], precision=_PREC)[:, 0]
    return m_new, W_new, S_half


def sr_add_diag_noise(W, qdiag):
    """Factor of W W^T + diag(qdiag) (qdiag >= 0), via QR recompression."""
    cols = jnp.diag(jnp.sqrt(jnp.maximum(qdiag, 0.0)).astype(W.dtype))
    return qr_factor(jnp.concatenate([W, cols], axis=1))


def sr_innovation_chi2(W, H, v, r_var):
    """chi^2 = v^T (H P H^T + r_var I)^{-1} v computed from the factor.

    Returns +inf when the solve is non-finite (degenerate S must reject)."""
    HW = jnp.matmul(H, W, precision=_PREC)
    n = H.shape[0]
    S = jnp.matmul(HW, HW.T, precision=_PREC) + r_var * jnp.eye(n, dtype=W.dtype)
    cho = jax.scipy.linalg.cho_factor(S)
    Sv = jax.scipy.linalg.cho_solve(cho, v[:, None])[:, 0]
    Sv = jnp.where(jnp.isfinite(Sv), Sv, jnp.inf)
    return jnp.dot(Sv, v)


def cov_block(W, rows: slice):
    """Dense covariance block P[rows, rows] from the factor."""
    Wr = W[rows, :]
    return jnp.matmul(Wr, Wr.T, precision=_PREC)


def cov_diag(W):
    """diag(P) from the factor."""
    return jnp.sum(W * W, axis=1)


def cov_full(W):
    return jnp.matmul(W, W.T, precision=_PREC)
