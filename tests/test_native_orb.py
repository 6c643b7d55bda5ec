"""Native (C++) multi-scale ORB detector vs the JAX host-backend build.

The SLAM worker runs at keyframe rate on the host CPU; the XLA build of the
detector costs ~75 s to compile and ~0.66 s per 752x480 frame, which stalls
the async worker into dropping keyframes (native/orb_detect.cpp header for
the numbers). The native detector implements the same contract
(slam/keypoints.py semantics; reference: slam.orb* family,
codegen/parameter_definitions.c:479-484) and must agree with the JAX build
on the same image.
"""
import numpy as np
import pytest

from hybvio_tpu.slam.native_orb import make_native_orb, native_orb_available

pytestmark = pytest.mark.skipif(not native_orb_available(),
                                reason="native library not built")


def _texture(H, W, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.rand(H // 8 + 1, W // 8 + 1)
    img = np.kron(base, np.ones((8, 8)))[:H, :W].astype(np.float32)
    img += 0.15 * rng.rand(H, W).astype(np.float32)
    return np.clip(img, 0.0, 1.0)


def test_native_matches_jax_detector():
    from hybvio_tpu.slam.keypoints import make_multiscale_orb

    H, W = 240, 320
    img = _texture(H, W, seed=3)
    det_n, cap_n = make_native_orb(H, W)
    det_j, cap_j = make_multiscale_orb(H, W)
    assert cap_n == cap_j
    pn, ln, dn, vn = det_n(img)
    pj, lj, dj, vj = det_j(img)
    np.testing.assert_array_equal(ln, lj)
    assert int(vn.sum()) > 30
    both = vn & vj
    # same budget, same selection rule: near-total overlap, same pixels
    assert both.sum() >= 0.95 * max(vn.sum(), vj.sum())
    dist = np.linalg.norm(pn[both] - pj[both], axis=1)
    assert float(np.median(dist)) < 0.5, np.median(dist)
    agree = (dn[both] * dj[both] > 0).mean(axis=1)
    # descriptors sampled from the same pattern on the same smoothed level
    assert float(np.median(agree)) > 0.95, np.median(agree)


def test_native_orb_no_keypoints_on_blank():
    det, cap = make_native_orb(120, 160)
    pts, lvl, desc, ok = det(np.zeros((120, 160), np.float32))
    assert pts.shape == (cap, 2) and desc.shape == (cap, 256)
    assert not ok.any()


def test_native_orb_scale_matching():
    """The point of the pyramid: the same scene at 2x viewing scale produces
    matching descriptors a few levels apart (mirror of the JAX detector's
    test in test_multiscale_keypoints.py)."""
    from hybvio_tpu.slam.orb import match_descriptors

    H, W = 240, 320
    img = _texture(H, W, seed=5)
    # "2x closer": upscale the central crop to full size
    cy, cx = H // 4, W // 4
    crop = img[cy:cy + H // 2, cx:cx + W // 2]
    big = np.kron(crop, np.ones((2, 2))).astype(np.float32)

    det, cap = make_native_orb(H, W)
    p1, l1, d1, v1 = det(img)
    p2, l2, d2, v2 = det(big)
    midx, _ = match_descriptors(d1.astype(np.float32), v1,
                                d2.astype(np.float32), v2, lowe_ratio=0.8)
    midx = np.asarray(midx)
    n_match = int((midx >= 0).sum())
    assert n_match >= 10, n_match
    # matched pairs should sit ~log_1.2(2) ~ 3.8 levels apart on average
    dl = (np.asarray(l2)[midx[midx >= 0]]
          - np.asarray(l1)[midx >= 0]).astype(float)
    assert 1.5 < float(np.mean(dl)) < 6.0, np.mean(dl)
