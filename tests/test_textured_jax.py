"""JAX textured renderer (io/textured_jax.py): geometry parity with the
numpy ray caster and the texture/noise properties the front-end needs.

The long-sequence accuracy protocol (VERDICT round-2 item 1) renders whole
752x480 sequences on device; these tests pin the renderer's behavior at CPU
test scale."""
import numpy as np

from hybvio_tpu.io.synthetic import SYNTH_IMU_TO_CAMERA, generate_sequence
from hybvio_tpu.io.textured import TexturedScene, textured_frame_renderer
from hybvio_tpu.io.textured_jax import make_textured_renderer

W, H = 160, 120
FX = FY = 130.0
CX, CY = W / 2, H / 2


def _seq():
    return generate_sequence(duration=3.0, imu_rate=100.0, frame_rate=10.0,
                             seed=8, radius=2.0)


def test_geometry_matches_numpy_renderer():
    """With contrast=0 every surface renders at a constant albedo, so the
    image is purely geometry (hit surface + distance attenuation): the jax
    and numpy ray casters must agree pixelwise up to f32 rounding except on
    silhouette edges where a half-ulp ray difference flips the hit."""
    scene = TexturedScene(seed=5, contrast=0.0, n_occluders=6)
    seq = _seq()
    render_np = textured_frame_renderer(
        scene, seq, SYNTH_IMU_TO_CAMERA, FX, FY, CX, CY, W, H)
    render_j = make_textured_renderer(
        scene, SYNTH_IMU_TO_CAMERA, FX, FY, CX, CY, W, H)
    imgs = render_j(seq, np.arange(3), chunk=4)
    for fi in range(3):
        a = render_np(fi)
        b = imgs[fi]
        close = np.abs(a - b) < 1e-3
        assert close.mean() > 0.995, f"frame {fi}: {1 - close.mean():.4f} off"


def test_texture_has_gradients_and_determinism():
    scene = TexturedScene(seed=1)
    seq = _seq()
    render_j = make_textured_renderer(
        scene, SYNTH_IMU_TO_CAMERA, FX, FY, CX, CY, W, H,
        exposure_jitter=0.05, pixel_noise=0.01, motion_blur=True)
    a = render_j(seq, np.arange(2))
    b = render_j(seq, np.arange(2))
    np.testing.assert_array_equal(a, b)
    gy, gx = np.gradient(a[1])
    frac = float((np.hypot(gx, gy) > 0.01).mean())
    assert frac > 0.25, f"texture too flat for LK: {frac}"
    assert 0.05 < a[1].std() < 0.35


def test_chunked_render_matches_single_chunk():
    """Chunk padding must not change results (up to batch-size-dependent
    XLA fusion rounding, observed ~2e-6)."""
    scene = TexturedScene(seed=3)
    seq = _seq()
    render_j = make_textured_renderer(
        scene, SYNTH_IMU_TO_CAMERA, FX, FY, CX, CY, W, H,
        exposure_jitter=0.05, pixel_noise=0.01)
    a = render_j(seq, np.arange(5), chunk=2)
    b = render_j(seq, np.arange(5), chunk=8)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_fisheye_render_geometry():
    """KB4 fisheye rays agree with the numpy renderer (contrast=0)."""
    scene = TexturedScene(seed=7, contrast=0.0)
    seq = _seq()
    kb4 = (0.0035, 0.0007, -0.002, 0.0002)
    render_np = textured_frame_renderer(
        scene, seq, SYNTH_IMU_TO_CAMERA, 60.0, 60.0, CX, CY, W, H,
        fisheye_coeffs=kb4)
    render_j = make_textured_renderer(
        scene, SYNTH_IMU_TO_CAMERA, 60.0, 60.0, CX, CY, W, H,
        fisheye_coeffs=kb4)
    imgs = render_j(seq, np.arange(2))
    for fi in range(2):
        close = np.abs(render_np(fi) - imgs[fi]) < 1e-3
        assert close.mean() > 0.995
