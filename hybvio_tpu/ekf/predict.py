"""EKF prediction step (reference: src/odometry/ekf.cpp:319-514).

Mechanization (variable names follow the reference):
    p_new = p + v dt
    q_new = A q,          A = expm(-dt/2 S(xg - bga))   [closed form here]
    v_new = v + (R(q_new)^T (BAT*xa - baa) + g) dt
    baa  *= exp(-dt theta_a)   (mean-reverting OU walk, optional)
    bga  *= exp(-dt theta_g)

Covariance: block update exploiting the identity lower-right of the full
transition matrix:
    P_II = F P_II F^T + G Q G^T ;  P_TI = P_TI F^T ;  P_IT = F P_IT
where F = dydx (20x20), G = dydq (20x12).

The dydq ORI/gyro-noise columns use the same first-order approximation as the
reference (A * dS_i * q_prev; see the reference's comment about the matrix
exponential derivative, ekf.cpp:478-487), so predict Jacobians match the
reference, and are tested against numeric differencing like reference
test/ekf.cpp "der_predict" (tolerance 1e-3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.quaternion import gyro_update_matrix, quat_to_rmat
from .state import (
    BAA, BAT, BGA, INER_DIM, ORI, POS, Q_ACC, Q_BAA_DRIFT, Q_BGA_DRIFT,
    Q_DIM, Q_GYRO, VEL, EKFState, process_noise_q,
)
from .update import pdot


def predict_mean_and_jacobians(po, m, dt, xg, xa, dtype=jnp.float64):
    """Core of the prediction: returns (m_new, dydx (20,20), dydq (20,12)).

    m is the full state vector; only the inertial block changes.
    """
    gravity = jnp.asarray([0.0, 0.0, -po.gravity], dtype=dtype)
    use_baa_walk = po.noiseProcessBAA > 0.0
    use_bga_walk = po.noiseProcessBGA > 0.0

    w = xg - m[BGA : BGA + 3]
    A = gyro_update_matrix(w, dt)  # (4,4)

    prev_q = m[ORI : ORI + 4]
    new_q = A @ prev_q
    R = quat_to_rmat(new_q)  # world -> imu
    dR = jnp.moveaxis(jax.jacfwd(quat_to_rmat)(new_q), -1, 0)  # (4,3,3)

    Txab = m[BAT : BAT + 3] * xa - m[BAA : BAA + 3]

    new_p = m[POS : POS + 3] + m[VEL : VEL + 3] * dt
    new_v = m[VEL : VEL + 3] + (R.T @ Txab + gravity) * dt

    m = m.at[POS : POS + 3].set(new_p)
    m = m.at[VEL : VEL + 3].set(new_v)
    m = m.at[ORI : ORI + 4].set(new_q)
    if use_baa_walk:
        m = m.at[BAA : BAA + 3].multiply(jnp.exp(-dt * po.noiseProcessBAARev))
    if use_bga_walk:
        m = m.at[BGA : BGA + 3].multiply(jnp.exp(-dt * po.noiseProcessBGARev))

    # --- Jacobians (reference: ekf.cpp:450-501) ---
    dydx = jnp.eye(INER_DIM, dtype=dtype)
    dydq = jnp.zeros((INER_DIM, Q_DIM), dtype=dtype)

    dydx = dydx.at[POS : POS + 3, VEL : VEL + 3].set(dt * jnp.eye(3, dtype=dtype))

    # d v_new / d q: dR[k] = dR/dq_k at new_q; new_q = A q so chain rule by A
    dv_dnewq = jnp.stack([dR[k].T @ Txab for k in range(4)], axis=1) * dt  # (3,4)
    dydx = dydx.at[VEL : VEL + 3, ORI : ORI + 4].set(dv_dnewq @ A)
    dydx = dydx.at[ORI : ORI + 4, ORI : ORI + 4].set(A)

    # velocity wrt acc noise
    dydq = dydq.at[VEL : VEL + 3, Q_ACC : Q_ACC + 3].set(R.T * dt)

    # quaternion wrt gyro noise: A dS_i q_prev (the reference's approximation)
    h = dt / 2

    def smat(i):
        M = jnp.zeros((4, 4), dtype=dtype)
        if i == 0:
            M = M.at[0, 1].set(h).at[1, 0].set(-h).at[2, 3].set(h).at[3, 2].set(-h)
        elif i == 1:
            M = M.at[0, 2].set(h).at[1, 3].set(-h).at[2, 0].set(-h).at[3, 1].set(h)
        else:
            M = M.at[0, 3].set(h).at[1, 2].set(h).at[2, 1].set(-h).at[3, 0].set(-h)
        return M

    dq_dgyro = jnp.stack([A @ (smat(i) @ prev_q) for i in range(3)], axis=1)  # (4,3)
    dydq = dydq.at[ORI : ORI + 4, Q_GYRO : Q_GYRO + 3].set(dq_dgyro)
    dydq = dydq.at[BGA : BGA + 3, Q_BGA_DRIFT : Q_BGA_DRIFT + 3].set(jnp.eye(3, dtype=dtype))
    dydq = dydq.at[BAA : BAA + 3, Q_BAA_DRIFT : Q_BAA_DRIFT + 3].set(jnp.eye(3, dtype=dtype))

    dv_dgyro = dydx[VEL : VEL + 3, ORI : ORI + 4] @ dq_dgyro  # (3,3)
    dydq = dydq.at[VEL : VEL + 3, Q_GYRO : Q_GYRO + 3].set(dv_dgyro)
    dydx = dydx.at[VEL : VEL + 3, BGA : BGA + 3].set(-dv_dgyro)
    dydx = dydx.at[ORI : ORI + 4, BGA : BGA + 3].set(-dq_dgyro)
    dydx = dydx.at[VEL : VEL + 3, BAA : BAA + 3].set(-R.T * dt)
    dydx = dydx.at[VEL : VEL + 3, BAT : BAT + 3].set((R.T * xa[None, :]) * dt)

    if use_baa_walk:
        decay = jnp.exp(-dt * po.noiseProcessBAARev)
        dydx = dydx.at[BAA : BAA + 3, BAA : BAA + 3].set(decay * jnp.eye(3, dtype=dtype))
    if use_bga_walk:
        decay = jnp.exp(-dt * po.noiseProcessBGARev)
        dydx = dydx.at[BGA : BGA + 3, BGA : BGA + 3].set(decay * jnp.eye(3, dtype=dtype))

    return m, dydx, dydq


def process_noise_diag(po, dt, dtype=jnp.float64):
    """Process-noise diagonal incl. dt-dependent OU random-walk terms
    (reference: ekf.cpp:393-403)."""
    noise_scale = po.noiseScale * po.noiseScale
    q_diag = process_noise_q(po, dtype)
    if po.noiseProcessBAA > 0.0:
        qb = noise_scale * po.noiseProcessBAA**2
        if po.noiseProcessBAARev > 0.0:
            qb = qb * (1 - jnp.exp(-2 * dt * po.noiseProcessBAARev)) / (2 * po.noiseProcessBAARev)
        q_diag = q_diag.at[Q_BAA_DRIFT : Q_BAA_DRIFT + 3].set(qb)
    if po.noiseProcessBGA > 0.0:
        qg = noise_scale * po.noiseProcessBGA**2
        if po.noiseProcessBGARev > 0.0:
            qg = qg * (1 - jnp.exp(-2 * dt * po.noiseProcessBGARev)) / (2 * po.noiseProcessBGARev)
        q_diag = q_diag.at[Q_BGA_DRIFT : Q_BGA_DRIFT + 3].set(qg)
    return q_diag


def make_predict(po, dtype=jnp.float64, sqrt_mode: bool = False):
    """Build predict(state, t, xg, xa) -> state for static parameters po.

    sqrt_mode: state.P holds the square-root factor W (ekf/sqrt.py); the
    covariance propagation becomes W <- qr_factor([F W | G sqrt(Q)])."""

    def predict(s: EKFState, t, xg, xa) -> EKFState:
        t = jnp.asarray(t, dtype=dtype)
        xg = jnp.asarray(xg, dtype=dtype)
        xa = jnp.asarray(xa, dtype=dtype)
        first = ~s.got_first_sample
        dt = jnp.where(first, 0.0, t - s.prev_sample_t)
        first_sample_t = jnp.where(first, t, s.first_sample_t)
        time = jnp.where(first, s.time, t - first_sample_t)
        s = s._replace(
            prev_sample_t=t,
            first_sample_t=first_sample_t,
            got_first_sample=jnp.ones((), dtype=bool),
            time=time,
        )

        def do_predict(s):
            m, dydx, dydq = predict_mean_and_jacobians(po, s.m, dt, xg, xa, dtype)
            q_diag = process_noise_diag(po, dt, dtype)
            if sqrt_mode:
                # W <- qr_factor([F W | G sqrt(Q)]) with F = blockdiag(dydx, I)
                # and G supported on the inertial rows (ekf/sqrt.py)
                from .sqrt import qr_factor

                W = s.P
                W = W.at[:INER_DIM, :].set(pdot(dydx, W[:INER_DIM, :]))
                noise_cols = jnp.zeros((W.shape[0], Q_DIM), dtype)
                noise_cols = noise_cols.at[:INER_DIM, :].set(
                    dydq * jnp.sqrt(jnp.maximum(q_diag, 0.0))[None, :])
                W = qr_factor(jnp.concatenate([W, noise_cols], axis=1))
                return s._replace(m=m, P=W)
            P = s.P
            P_II = P[:INER_DIM, :INER_DIM]
            P_II = pdot(pdot(dydx, P_II), dydx.T) + pdot(dydq * q_diag[None, :], dydq.T)
            P_TI = pdot(P[INER_DIM:, :INER_DIM], dydx.T)
            P_IT = pdot(dydx, P[:INER_DIM, INER_DIM:])
            P = P.at[:INER_DIM, :INER_DIM].set(P_II)
            P = P.at[INER_DIM:, :INER_DIM].set(P_TI)
            P = P.at[:INER_DIM, INER_DIM:].set(P_IT)
            return s._replace(m=m, P=P)

        # skip if dt <= 0 (duplicate/out-of-order sample, reference ekf.cpp:371-374)
        return jax.lax.cond(dt > 0.0, do_predict, lambda s_: s_, s)

    return predict
