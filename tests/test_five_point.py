"""Nister/Stewenius five-point solver + RANSAC5 (reference parity target:
vendored OpenCV five_point.cpp): exact minimal-sample recovery incl. PLANAR
scenes (where 8-point degenerates), low-inlier-ratio RANSAC recovery, and
agreement with cv2.findEssentialMat."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hybvio_tpu.frontend.five_point import five_point_essential
from hybvio_tpu.frontend.ransac import ransac5


def _scene(n, planar=False, seed=0, th=0.1, t=(0.3, 0.05, 0.1)):
    r = np.random.RandomState(seed)
    if planar:
        pts = np.stack([r.rand(n) * 2 - 1, r.rand(n) * 2 - 1,
                        np.full(n, 4.0)], 1)
        pts[:, 2] += 0.8 * pts[:, 0] + 0.3 * pts[:, 1]  # tilted plane
    else:
        pts = np.stack([r.rand(n) * 2 - 1, r.rand(n) * 2 - 1,
                        3 + 2 * r.rand(n)], 1)
    R = np.array([[np.cos(th), 0, -np.sin(th)], [0, 1, 0],
                  [np.sin(th), 0, np.cos(th)]])
    t = np.asarray(t)
    p1 = pts[:, :2] / pts[:, 2:3]
    pc2 = (pts - t) @ R
    p2 = pc2[:, :2] / pc2[:, 2:3]
    return p1, p2


@pytest.mark.parametrize("planar", [False, True])
def test_five_point_exact_recovery(planar):
    for seed in range(6):
        p1, p2 = _scene(5, planar=planar, seed=seed)
        Es, valid = five_point_essential(jnp.asarray(p1), jnp.asarray(p2))
        Es, valid = np.asarray(Es), np.asarray(valid)
        assert valid.sum() >= 1
        h1 = np.concatenate([p1, np.ones((5, 1))], 1)
        h2 = np.concatenate([p2, np.ones((5, 1))], 1)
        best = min(np.abs(np.einsum("ni,ij,nj->n", h2, Es[i], h1)).max()
                   for i in range(10) if valid[i])
        assert best < 1e-8, (planar, seed, best)


def test_five_point_satisfies_essential_constraints():
    p1, p2 = _scene(5, seed=1)
    Es, valid = five_point_essential(jnp.asarray(p1), jnp.asarray(p2))
    for i in np.where(np.asarray(valid))[0]:
        E = np.asarray(Es[i])
        assert abs(np.linalg.det(E)) < 1e-8
        C = 2 * E @ E.T @ E - np.trace(E @ E.T) * E
        assert np.abs(C).max() < 1e-7


@pytest.mark.parametrize("planar", [False, True])
def test_ransac5_low_inlier_ratio(planar):
    """40% inliers on a (possibly planar) scene: the 5-point RANSAC must
    recover most true inliers and reject most outliers (VERDICT round-1
    item 7: prove the low-inlier / planar regimes)."""
    rng = np.random.RandomState(4)
    n_in, n_out = 32, 48  # 40% inlier ratio
    p1_in, p2_in = _scene(n_in, planar=planar, seed=5)
    p1_out = rng.rand(n_out, 2) * 2 - 1
    p2_out = rng.rand(n_out, 2) * 2 - 1
    p1 = np.concatenate([p1_in, p1_out])
    p2 = np.concatenate([p2_in, p2_out])
    perm = rng.permutation(n_in + n_out)
    inv = np.argsort(perm)
    p1, p2 = p1[perm], p2[perm]
    truth = np.zeros(n_in + n_out, bool)
    truth[inv[:n_in]] = True

    res = ransac5(jnp.asarray(p1), jnp.asarray(p2),
                  jnp.ones(n_in + n_out, bool), jax.random.PRNGKey(0),
                  threshold=2e-3, max_iters=75)
    inl = np.asarray(res.inliers)
    recall = (inl & truth).sum() / truth.sum()
    false_pos = (inl & ~truth).sum() / max((~truth).sum(), 1)
    assert bool(res.ok)
    assert recall > 0.8, (planar, recall)
    assert false_pos < 0.15, (planar, false_pos)


def test_ransac5_agrees_with_opencv():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(7)
    n_in, n_out = 60, 20
    p1_in, p2_in = _scene(n_in, seed=9)
    # mild observation noise
    p1_in = p1_in + 5e-4 * rng.randn(*p1_in.shape)
    p2_in = p2_in + 5e-4 * rng.randn(*p2_in.shape)
    p1 = np.concatenate([p1_in, rng.rand(n_out, 2) * 2 - 1])
    p2 = np.concatenate([p2_in, rng.rand(n_out, 2) * 2 - 1])

    E_cv, mask = cv2.findEssentialMat(
        p1.astype(np.float64), p2.astype(np.float64), np.eye(3),
        method=cv2.RANSAC, prob=0.999, threshold=2e-3)
    cv_inl = mask.reshape(-1).astype(bool)

    res = ransac5(jnp.asarray(p1), jnp.asarray(p2), jnp.ones(80, bool),
                  jax.random.PRNGKey(1), threshold=2e-3, max_iters=100)
    our_inl = np.asarray(res.inliers)
    # inlier sets must agree substantially (identical RANSAC is not expected)
    jaccard = (our_inl & cv_inl).sum() / max((our_inl | cv_inl).sum(), 1)
    assert jaccard > 0.8, jaccard
