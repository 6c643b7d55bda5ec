"""Trajectory evaluation: umeyama-aligned ATE RMSE (the vio_benchmark metric
the reference is evaluated with; reference: README.md:72-77)."""
from __future__ import annotations

import numpy as np


def umeyama_alignment(x: np.ndarray, y: np.ndarray, with_scale: bool = False):
    """Least-squares similarity transform aligning x -> y; x, y: (N,3).

    Returns (R, t, s) with y ~ s R x + t.
    """
    mx = x.mean(axis=0)
    my = y.mean(axis=0)
    xc = x - mx
    yc = y - my
    C = yc.T @ xc / x.shape[0]
    U, D, Vt = np.linalg.svd(C)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_x = (xc**2).sum() / x.shape[0]
        s = np.trace(np.diag(D) @ S) / var_x
    else:
        s = 1.0
    t = my - s * R @ mx
    return R, t, s


def ate_rmse(estimated: np.ndarray, ground_truth: np.ndarray, align: bool = True,
             with_scale: bool = False) -> float:
    """Absolute trajectory error RMSE after (optional) umeyama alignment."""
    est = np.asarray(estimated, dtype=np.float64)
    gt = np.asarray(ground_truth, dtype=np.float64)
    assert est.shape == gt.shape
    if align:
        R, t, s = umeyama_alignment(est, gt, with_scale)
        est = (s * (R @ est.T)).T + t
    e = est - gt
    return float(np.sqrt((e * e).sum(axis=1).mean()))


def rpe_rmse(estimated: np.ndarray, ground_truth: np.ndarray, delta: int = 1) -> float:
    """Relative pose (translation) error RMSE over position deltas."""
    est = np.asarray(estimated, dtype=np.float64)
    gt = np.asarray(ground_truth, dtype=np.float64)
    de = est[delta:] - est[:-delta]
    dg = gt[delta:] - gt[:-delta]
    e = de - dg
    return float(np.sqrt((e * e).sum(axis=1).mean()))
