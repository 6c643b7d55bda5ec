"""Nister/Stewenius five-point essential-matrix minimal solver, TPU-native.

The reference vendors OpenCV's Nister 5-point solver
(reference: src/tracker/five_point.cpp:1-30,404) whose core is a
Gauss-Jordan elimination over hand-expanded cubic constraint polynomials
followed by a 10th-degree polynomial root finding. That code path is scalar
and branchy; this redesign keeps the published algebra (Nister 2004 /
Stewenius et al. 2006) but expresses every step as batched linear algebra so
it vmaps cleanly over RANSAC hypotheses:

  1. nullspace of the 5x9 epipolar system (SVD) -> E = xX + yY + zZ + W;
  2. the 10 cubic constraints (det E = 0 and 2 E E^T E - tr(E E^T) E = 0)
     are expanded into the 20 monomial coefficients NUMERICALLY: evaluate the
     constraints at a fixed set of sample points (x,y,z) and multiply by a
     PRECOMPUTED Vandermonde pseudo-inverse — exact for polynomials of
     degree <= 3, and it turns symbolic expansion into one matmul;
  3. Gauss-Jordan on the (10, 20) system -> multiplication ("action") matrix
     of x on the 10-dimensional quotient ring basis (Stewenius);
  4. eigenvalues of the action matrix via the Faddeev-LeVerrier
     characteristic polynomial + Durand-Kerner root iteration (fixed trip
     count, complex arithmetic) — TPU has no general eigensolver;
  5. eigenvectors via direct nullspace SVD of (A - x I) give (x, y, z) and
     hence up to 10 real essential matrices per 5-point sample.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# monomial exponents (x, y, z): 10 cubics then the 10-dim quotient basis
_MONO3 = [(3, 0, 0), (2, 1, 0), (2, 0, 1), (1, 2, 0), (1, 1, 1),
          (1, 0, 2), (0, 3, 0), (0, 2, 1), (0, 1, 2), (0, 0, 3)]
_MONO2 = [(2, 0, 0), (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1),
          (0, 0, 2), (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]
_MONOS = _MONO3 + _MONO2

# fixed, well-conditioned sample design for numeric polynomial expansion
_NS = 32
_rng = np.random.RandomState(61)
_SAMPLES = _rng.randn(_NS, 3)
_SAMPLES /= np.linalg.norm(_SAMPLES, axis=1, keepdims=True)
_SAMPLES *= (0.6 + 0.8 * _rng.rand(_NS, 1))
_V = np.stack([
    [s[0] ** ex * s[1] ** ey * s[2] ** ez for (ex, ey, ez) in _MONOS]
    for s in _SAMPLES])  # (NS, 20)
_PINV = np.linalg.pinv(_V)  # (20, NS), constant

# indices into the quotient basis _MONO2
_IX2, _IXY, _IXZ, _IY2, _IYZ, _IZ2, _IX, _IY, _IZ, _I1 = range(10)


def _constraints(E):
    """The 10 cubic constraint values for a 3x3 E: [det E; vec(2 E E^T E -
    tr(E E^T) E)] (Nister 2004 eq. 5-6)."""
    det = jnp.linalg.det(E)
    EEt = E @ E.T
    C = 2.0 * (EEt @ E) - jnp.trace(EEt) * E
    return jnp.concatenate([det[None], C.reshape(-1)])


def _coeff_matrix(X, Y, Z, W, dtype):
    """(10, 20) coefficients of the 10 constraints over _MONOS, via the
    sample-evaluate-and-project trick (exact for degree-3 polynomials)."""
    samples = jnp.asarray(_SAMPLES, dtype)

    def at_sample(s):
        E = s[0] * X + s[1] * Y + s[2] * Z + W
        return _constraints(E)  # (10,)

    G = jax.vmap(at_sample)(samples)  # (NS, 10)
    return (jnp.asarray(_PINV, dtype) @ G).T  # (10, 20)


def _action_matrix(M, dtype):
    """Gauss-Jordan the (10, 20) system and build the multiplication-by-x
    action matrix on the quotient basis (Stewenius et al. 2006)."""
    A3 = M[:, :10]
    B2 = M[:, 10:]
    # R: each degree-3 monomial expressed in the degree-<=2 basis: m3_i = -R[i]
    R = jnp.linalg.solve(A3, B2)  # (10, 10)

    # x * basis_j in _MONO3 coords: x*x^2=x^3(0), x*xy=x^2y(1), x*xz=x^2z(2),
    # x*y^2=xy^2(3), x*yz=xyz(4), x*z^2=xz^2(5); x*x=x^2, x*y=xy, x*z=xz, x*1=x
    Ax = jnp.zeros((10, 10), dtype)
    for col, m3row in zip((_IX2, _IXY, _IXZ, _IY2, _IYZ, _IZ2),
                          (0, 1, 2, 3, 4, 5)):
        Ax = Ax.at[:, col].set(-R[m3row])
    Ax = Ax.at[_IX2, _IX].set(1.0)
    Ax = Ax.at[_IXY, _IY].set(1.0)
    Ax = Ax.at[_IXZ, _IZ].set(1.0)
    Ax = Ax.at[_IX, _I1].set(1.0)
    return Ax


def _charpoly(A):
    """Coefficients c of det(tI - A) = t^10 + c[0] t^9 + ... + c[9] via
    Faddeev-LeVerrier (batched matmuls only)."""
    n = A.shape[0]
    eye = jnp.eye(n, dtype=A.dtype)

    def body(Mk, k):
        ck = -jnp.trace(A @ Mk) / k.astype(A.dtype)
        Mk1 = A @ Mk + ck * eye
        return Mk1, ck

    _, cs = jax.lax.scan(body, eye, jnp.arange(1, n + 1))
    return cs


def _roots_durand_kerner(coeffs, iters: int = 32):
    """All 10 complex roots of t^10 + c[0] t^9 + ... + c[9]."""
    n = coeffs.shape[0]
    cdtype = jnp.complex128 if coeffs.dtype == jnp.float64 else jnp.complex64
    c = coeffs.astype(cdtype)
    # scale roots into ~unit ball for stability: t = s*u with s from coeffs
    s = jnp.maximum(jnp.max(jnp.abs(c)) ** (1.0 / n), 1e-6).astype(cdtype)
    powers = s ** jnp.arange(1, n + 1, dtype=coeffs.dtype)
    cu = c / powers.astype(cdtype)  # scaled polynomial coefficients

    def poly(u):
        # u^10 + cu[0] u^9 + ... + cu[9]; Horner unrolled (n is static and
        # small — a scan here would serialize 10 extra steps per DK
        # iteration inside the fori_loop, which dominates solver latency)
        acc = jnp.ones_like(u)
        for k in range(n):
            acc = acc * u + cu[k]
        return acc

    w0 = (0.4 + 0.9j) ** jnp.arange(1, n + 1)
    w = w0.astype(cdtype)

    def body(_, w):
        pw = poly(w)
        diff = w[:, None] - w[None, :] + jnp.eye(n, dtype=cdtype)
        denom = jnp.prod(diff, axis=1)
        step = pw / denom
        # damp huge steps (near-multiple roots)
        step = jnp.where(jnp.abs(step) > 10.0, step / jnp.abs(step) * 10.0, step)
        return w - step

    w = jax.lax.fori_loop(0, iters, body, w)
    return w * s


def five_point_essential(pts1, pts2, dtype=None):
    """Up to 10 essential matrices for 5 normalized correspondences.

    pts1, pts2: (5, 2). Returns (Es (10, 3, 3), valid (10,) bool).
    """
    dtype = dtype or pts1.dtype
    h1 = jnp.concatenate([pts1, jnp.ones((5, 1), dtype)], axis=1)
    h2 = jnp.concatenate([pts2, jnp.ones((5, 1), dtype)], axis=1)
    A = jnp.einsum("ni,nj->nij", h2, h1).reshape(5, 9)
    # nullspace of the 5x9 system via complete QR of A^T (Householder):
    # Q[:, 5:] spans null(A) exactly; cheaper than the full SVD under a
    # wide vmap (no iterative singular-value phase)
    Q, _ = jnp.linalg.qr(A.T, mode="complete")  # (9, 9)
    null = Q[:, 5:9].T  # (4, 9)
    X, Y, Z, W = (null[i].reshape(3, 3) for i in range(4))

    M = _coeff_matrix(X, Y, Z, W, dtype)
    Ax = _action_matrix(M, dtype)
    finite = jnp.all(jnp.isfinite(Ax))
    Ax = jnp.where(finite, Ax, jnp.eye(10, dtype=dtype))

    roots = _roots_durand_kerner(_charpoly(Ax))  # (10,) complex x-roots
    # root-count note: 32 Durand-Kerner iterations converge this degree-10
    # family to the same residuals as 60 (swept at f32 and f64); the
    # imaginary-part gate is deliberately LOOSE (f32 charpoly noise pushes
    # genuinely-real roots off the axis) because the on-variety residual
    # check below is the authoritative validity filter
    scale = jnp.maximum(jnp.max(jnp.abs(roots.real)), 1.0)
    is_real = jnp.abs(roots.imag) < 0.3 * scale

    eye = jnp.eye(10, dtype=dtype)

    def extract(xr):
        # The evaluation vector v = [basis monomials at the solution] obeys
        # x*v = Ax^T v (Ax columns hold the reduction coefficients of x*b_j),
        # so extract v from the nullspace of (Ax^T - x I) by inverse
        # iteration: ONE LU factorization reused across 3 solves (the
        # factorization dominates; 3 independent jnp.linalg.solve calls
        # would refactor every time)
        B = Ax.T - xr * eye + 1e-10 * eye
        lu, piv = jax.scipy.linalg.lu_factor(B)
        v = jnp.ones(10, dtype)
        for _ in range(3):
            v = jax.scipy.linalg.lu_solve((lu, piv), v)
            nv = jnp.linalg.norm(v)
            v = v / jnp.where(nv > 1e-300, nv, 1.0)
        v = jnp.where(jnp.all(jnp.isfinite(v)), v, jnp.ones(10, dtype))
        denom = jnp.where(jnp.abs(v[_I1]) > 1e-12, v[_I1], 1.0)
        x = v[_IX] / denom
        y = v[_IY] / denom
        z = v[_IZ] / denom
        ok_v = jnp.abs(v[_I1]) > 1e-12
        E = x * X + y * Y + z * Z + W
        n = jnp.linalg.norm(E)
        E = E / jnp.where(n > 1e-12, n, 1.0)
        # on-variety check: near-real complex roots can pass the imaginary-
        # part gate yet land off the essential variety (det=0 but sigma1 !=
        # sigma2); such E overfit the 5 points and poison RANSAC scoring
        cres = jnp.linalg.norm(_constraints(E))
        tol = 1e-3 if dtype == jnp.float32 else 1e-6
        return E, ok_v & (n > 1e-12) & (cres < tol)

    Es, oks = jax.vmap(extract)(roots.real.astype(dtype))
    valid = oks & is_real & finite
    return Es, valid
