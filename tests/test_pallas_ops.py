"""Pallas kernels match their XLA reference implementations.

Runs the TPU kernels in Pallas interpreter mode on the CPU test backend.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from hybvio_tpu.ops.gftt_pallas import PALLAS_AVAILABLE, corner_response_pallas
from hybvio_tpu.frontend.gftt import corner_response


@pytest.mark.skipif(not PALLAS_AVAILABLE, reason="pallas not importable")
@pytest.mark.parametrize("hw", [(120, 160), (64, 128), (97, 160)])
def test_corner_response_pallas_matches_xla(hw):
    h, w = hw
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(h, w).astype(np.float32))
    ref = np.asarray(corner_response(img))
    out = np.asarray(corner_response_pallas(img, interpret=True))
    assert out.shape == ref.shape
    # interiors match exactly; boundary rows within the stencil radius differ
    # in padding order and are discarded by the detector's 5-px margin
    m = 3
    np.testing.assert_allclose(out[m:-m, m:-m], ref[m:-m, m:-m],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not PALLAS_AVAILABLE, reason="pallas not importable")
def test_corner_response_pallas_block5(hw=(96, 128)):
    h, w = hw
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(h, w).astype(np.float32))
    ref = np.asarray(corner_response(img, block_size=5))
    out = np.asarray(corner_response_pallas(img, block_size=5, interpret=True))
    m = 4
    np.testing.assert_allclose(out[m:-m, m:-m], ref[m:-m, m:-m],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not PALLAS_AVAILABLE, reason="pallas not importable")
@pytest.mark.parametrize("hw", [(120, 160), (97, 128)])
def test_pyr_down_pallas_matches_xla(hw):
    from hybvio_tpu.frontend.pyramid import pyr_down
    from hybvio_tpu.ops.pyramid_pallas import pyr_down_pallas

    h, w = hw
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(h, w).astype(np.float32))
    ref = np.asarray(pyr_down(img))
    out = np.asarray(pyr_down_pallas(img, interpret=True))
    assert out.shape == ref.shape
    m = 2
    np.testing.assert_allclose(out[m:-m, m:-m], ref[m:-m, m:-m],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not PALLAS_AVAILABLE, reason="pallas not importable")
def test_scharr_pallas_matches_xla():
    from hybvio_tpu.frontend.pyramid import scharr_gradients
    from hybvio_tpu.ops.pyramid_pallas import scharr_pallas

    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(120, 160).astype(np.float32))
    rx, ry = scharr_gradients(img)
    gx, gy = scharr_pallas(img, interpret=True)
    m = 2
    np.testing.assert_allclose(np.asarray(gx)[m:-m, m:-m],
                               np.asarray(rx)[m:-m, m:-m], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy)[m:-m, m:-m],
                               np.asarray(ry)[m:-m, m:-m], rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not PALLAS_AVAILABLE, reason="pallas not importable")
def test_greedy_nms_pallas_matches_scan():
    from hybvio_tpu.ops.nms_pallas import greedy_min_distance_pallas

    rng = np.random.RandomState(5)
    k = 128
    xy = rng.rand(k, 2) * 100
    d2 = jnp.asarray(((xy[:, None] - xy[None]) ** 2).sum(-1))
    ok = jnp.asarray(rng.rand(k) > 0.2)
    min_d2 = 64.0

    # scan oracle
    import jax as _jax

    def body(sel, i):
        near = jnp.any(sel & (d2[i] < min_d2))
        take = ok[i] & ~near
        return sel.at[i].set(take), take

    _, ref = _jax.lax.scan(body, jnp.zeros((k,), bool), jnp.arange(k))
    out = greedy_min_distance_pallas(d2.astype(jnp.float32), ok, min_d2,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.skipif(not PALLAS_AVAILABLE, reason="pallas not importable")
@pytest.mark.parametrize("ps", [13, 21])
def test_patch_gather_pallas_matches_dynamic_slice(ps):
    # tile-aligned dims so the interpreter's in-bounds DMAs match the TPU
    # padded-layout reads (on hardware the block may cover XLA tile padding;
    # the extracted window never does)
    from hybvio_tpu.ops.patch_gather_pallas import _gather_batched

    H, W = 128, 256
    B, N = 2, 37
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(B, H, W).astype(np.float32))
    y0 = jnp.asarray(rng.randint(0, H - ps + 1, size=(B, N)), jnp.int32)
    x0 = jnp.asarray(rng.randint(0, W - ps + 1, size=(B, N)), jnp.int32)
    # include the extreme corners (clamp boundary cases)
    y0 = y0.at[:, 0].set(0).at[:, 1].set(H - ps)
    x0 = x0.at[:, 0].set(0).at[:, 1].set(W - ps)
    out = np.asarray(_gather_batched(img, y0, x0, ps, interpret=True))
    for b in range(B):
        for n in range(N):
            ref = img[b, int(y0[b, n]):int(y0[b, n]) + ps,
                      int(x0[b, n]):int(x0[b, n]) + ps]
            np.testing.assert_array_equal(out[b, n], np.asarray(ref))


@pytest.mark.skipif(not PALLAS_AVAILABLE, reason="pallas not importable")
def test_patch_gather_pallas_custom_vmap_rule(ps=15):
    # the public wrapper under vmap must produce one batched launch with the
    # same numbers as the per-item form
    import jax

    from hybvio_tpu.ops.patch_gather_pallas import _gather_batched

    H, W = 64, 128
    B, N = 3, 11
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.rand(B, H, W).astype(np.float32))
    y0 = jnp.asarray(rng.randint(0, H - ps + 1, size=(B, N)), jnp.int32)
    x0 = jnp.asarray(rng.randint(0, W - ps + 1, size=(B, N)), jnp.int32)
    batched = np.asarray(_gather_batched(img, y0, x0, ps, interpret=True))

    def one(im, yy, xx):
        return jax.vmap(
            lambda a, b: jax.lax.dynamic_slice(im, (a, b), (ps, ps)))(yy, xx)

    ref = np.asarray(jax.vmap(one)(img, y0, x0))
    np.testing.assert_array_equal(batched, ref)
