"""FAST-9/16 corner detector (legacy detector option)."""
import jax.numpy as jnp
import numpy as np

from hybvio_tpu.frontend.fast import detect_fast, fast_score


def test_fast_score_fires_on_corner_not_edge():
    img = np.zeros((32, 32), np.float32)
    img[8:, 8:] = 1.0  # bright quadrant: corner at (8, 8)
    s = np.asarray(fast_score(jnp.asarray(img), 0.1))
    # strongest response near the corner
    y, x = np.unravel_index(s.argmax(), s.shape)
    assert abs(x - 8) <= 2 and abs(y - 8) <= 2
    assert s.max() > 0.5
    # a straight edge far from the corner is not a FAST corner (contiguous
    # arc of 9 on one side cannot form along a straight boundary)
    assert s[20, 8] == 0.0 or s[20, 8] < s[y, x] * 0.2
    # flat regions silent
    assert s[:5, :5].max() == 0.0
    assert s[20:, 20:].max() == 0.0


def test_detect_fast_selection_contract():
    rng = np.random.RandomState(0)
    img = np.zeros((96, 128), np.float32)
    centers = [(20, 20), (20, 100), (70, 30), (70, 100), (45, 64)]
    for (cy, cx) in centers:
        img[cy:cy + 8, cx:cx + 8] = 0.9  # bright squares: 4 corners each
    existing = jnp.asarray([[20.0, 20.0]])  # mask one corner region
    xy, score, valid = detect_fast(
        jnp.asarray(img), 16, existing, jnp.ones((1,), bool),
        mask_radius=6.0, min_distance=5.0, threshold=0.3)
    xy = np.asarray(xy)[np.asarray(valid)]
    assert len(xy) >= 8  # squares have 4 corners each
    # detections near square corners
    corners = np.array([(cx + dx, cy + dy) for (cy, cx) in centers
                        for dx in (0, 7) for dy in (0, 7)], float)
    d = np.linalg.norm(xy[:, None] - corners[None], axis=-1).min(axis=1)
    assert np.median(d) < 3.0
    # masked region respected
    d_masked = np.linalg.norm(xy - np.array([20.0, 20.0]), axis=1)
    assert d_masked.min() >= 6.0 - 1e-6
    # min distance respected
    dd = np.linalg.norm(xy[:, None] - xy[None], axis=-1)
    np.fill_diagonal(dd, 1e9)
    assert dd.min() >= 5.0 - 1e-6
