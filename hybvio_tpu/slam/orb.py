"""ORB-style binary descriptors for loop closure, TPU-native.

The reference SLAM module uses ORB features with a DBoW2 vocabulary for loop
closure (reference: slam.orb* / slam.vocabularyPath parameters,
parameter_definitions.c:459-484; module source not in snapshot). This
redesign keeps rotated-BRIEF-256 descriptors (steered by the intensity
centroid orientation, computed on a smoothed image) but replaces the offline
DBoW2 vocabulary with vocabulary-free matmul scoring: descriptors as +/-1
vectors make both the per-frame global signature (mean descriptor) and
pairwise Hamming matching MXU-shaped dot products, so no binary tree or
trained vocabulary file is needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend.pyramid import _sep_conv2d, bilinear_sample

N_BITS = 256
_PATCH_R = 15  # BRIEF sampling radius (31x31 patch like ORB)

# deterministic BRIEF sampling pattern (gaussian-ish like ORB's learned pairs)
_rng = np.random.RandomState(20240401)
_PAIRS_A = np.clip(_rng.randn(N_BITS, 2) * _PATCH_R / 2.5, -_PATCH_R, _PATCH_R)
_PAIRS_B = np.clip(_rng.randn(N_BITS, 2) * _PATCH_R / 2.5, -_PATCH_R, _PATCH_R)


def orb_descriptors(image: jnp.ndarray, pts: jnp.ndarray, valid: jnp.ndarray):
    """Compute N_BITS binary descriptors at pts (T,2); returns (desc (T, N_BITS)
    in {-1, +1} float, ok (T,)). Orientation by intensity centroid
    (reference ORB semantics; slam.orb* parameters)."""
    dtype = image.dtype
    # smooth like ORB (BRIEF needs blur)
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    img = _sep_conv2d(image, k, k)
    H, W = img.shape

    r = _PATCH_R
    ax = jnp.arange(-r, r + 1, dtype=dtype)
    ox, oy = jnp.meshgrid(ax, ax, indexing="xy")
    circ = (ox * ox + oy * oy) <= r * r
    offs = jnp.stack([ox, oy], axis=-1).reshape(-1, 2)
    circf = circ.reshape(-1).astype(dtype)
    pa = jnp.asarray(_PAIRS_A, dtype)
    pb = jnp.asarray(_PAIRS_B, dtype)

    def one(p, ok_in):
        patch = bilinear_sample(img, p[None, :] + offs) * circf
        # intensity centroid orientation
        m10 = jnp.sum(patch * offs[:, 0])
        m01 = jnp.sum(patch * offs[:, 1])
        theta = jnp.arctan2(m01, m10)
        c, s = jnp.cos(theta), jnp.sin(theta)
        R = jnp.asarray([[c, -s], [s, c]])
        qa = p[None, :] + pa @ R.T
        qb = p[None, :] + pb @ R.T
        va = bilinear_sample(img, qa)
        vb = bilinear_sample(img, qb)
        desc = jnp.where(va > vb, 1.0, -1.0).astype(dtype)
        in_bounds = (p[0] >= r + 1) & (p[0] < W - r - 1) & (p[1] >= r + 1) & (p[1] < H - r - 1)
        return desc, ok_in & in_bounds

    return jax.vmap(one)(pts, valid)


def frame_signature(desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Global frame signature: mean of +/-1 descriptors over valid features
    (a vocabulary-free BoW stand-in; cosine similarity of signatures plays the
    role of DBoW2 scoring)."""
    w = valid.astype(desc.dtype)[:, None]
    s = jnp.sum(desc * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    n = jnp.linalg.norm(s)
    return s / jnp.where(n > 1e-9, n, 1.0)


def match_descriptors(desc_a, valid_a, desc_b, valid_b, lowe_ratio: float = 0.7):
    """Mutual best matching with Lowe ratio test
    (reference: slam.loopClosureFeatureMatchLoweRatio).

    desc in {-1,+1}: dot product similarity == N_BITS - 2*hamming.
    Returns (match_idx (Ta,) int32 index into b or -1, score (Ta,))."""
    sim = desc_a @ desc_b.T  # (Ta, Tb)
    neg = jnp.asarray(-1e9, sim.dtype)
    sim = jnp.where(valid_a[:, None] & valid_b[None, :], sim, neg)
    best = jnp.argmax(sim, axis=1)
    s1 = jnp.max(sim, axis=1)
    sim2 = sim.at[jnp.arange(sim.shape[0]), best].set(neg)
    s2 = jnp.max(sim2, axis=1)
    # convert similarity to hamming distance for the ratio test
    d1 = (N_BITS - s1) / 2
    d2 = (N_BITS - s2) / 2
    ratio_ok = d1 <= lowe_ratio * jnp.maximum(d2, 1.0)
    # mutual check
    back = jnp.argmax(jnp.where(valid_a[:, None] & valid_b[None, :], desc_a @ desc_b.T, neg), axis=0)
    mutual = back[best] == jnp.arange(desc_a.shape[0])
    ok = valid_a & ratio_ok & mutual & (s1 > neg / 2)
    return jnp.where(ok, best, -1).astype(jnp.int32), s1
