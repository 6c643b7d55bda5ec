"""Native image decoder (native/image_decode.cpp) vs PIL oracle."""
import numpy as np
import pytest
from PIL import Image

from hybvio_tpu.io.native_image import decode_gray_native


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    gray = (rng.rand(48, 64) * 255).astype(np.uint8)
    rgb = (rng.rand(32, 40, 3) * 255).astype(np.uint8)
    Image.fromarray(gray).save(d / "gray.png")
    Image.fromarray(rgb).save(d / "rgb.png")
    with open(d / "gray.pgm", "wb") as f:
        f.write(b"P5\n# c\n64 48\n255\n" + gray.tobytes())
    return d, gray, rgb


def test_png_gray(images):
    d, gray, _ = images
    out = decode_gray_native(str(d / "gray.png"))
    assert out is not None and out.shape == (48, 64)
    np.testing.assert_allclose(out, gray.astype(np.float32) / 255.0, atol=1e-6)


def test_png_rgb_luma(images):
    d, _, rgb = images
    out = decode_gray_native(str(d / "rgb.png"))
    ref = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
           + 0.114 * rgb[..., 2]).astype(np.float32) / 255.0
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pgm(images):
    d, gray, _ = images
    out = decode_gray_native(str(d / "gray.pgm"))
    np.testing.assert_allclose(out, gray.astype(np.float32) / 255.0, atol=1e-6)


def test_load_image_file_uses_native(images):
    # frames stay RAW uint8 end-to-end (the device normalizes;
    # io/video.py load_image_file)
    from hybvio_tpu.io.video import load_image_file

    d, gray, _ = images
    out = load_image_file(str(d / "gray.png"))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, gray)


def test_decode_u8_gray_and_pgm(images):
    from hybvio_tpu.io.native_image import decode_gray_u8_native

    d, gray, _ = images
    out = decode_gray_u8_native(str(d / "gray.png"))
    assert out is not None and out.dtype == np.uint8
    np.testing.assert_array_equal(out, gray)
    out = decode_gray_u8_native(str(d / "gray.pgm"))
    np.testing.assert_array_equal(out, gray)


def test_decode_u8_rgb_luma(images):
    from hybvio_tpu.io.native_image import decode_gray_u8_native

    d, _, rgb = images
    out = decode_gray_u8_native(str(d / "rgb.png"))
    ref = np.rint((299 * rgb[..., 0].astype(np.uint32)
                   + 587 * rgb[..., 1].astype(np.uint32)
                   + 114 * rgb[..., 2].astype(np.uint32)) / 1000.0)
    assert out is not None and out.dtype == np.uint8
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_bad_file_falls_back(tmp_path):
    p = tmp_path / "junk.png"
    p.write_bytes(b"not a png at all")
    assert decode_gray_native(str(p)) is None
