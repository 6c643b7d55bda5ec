"""Image pyramids and gradients for the tracker front-end.

Replaces cv::buildOpticalFlowPyramid (reference: src/tracker/image_pyramid.cpp)
with pure-XLA convolutions: 5x5 Gaussian [1,4,6,4,1]/16 (cv::pyrDown kernel)
separable downsampling, and Scharr gradients (what cv::calcOpticalFlowPyrLK
uses internally for the template derivatives).

Images are float32 (H, W) (optionally with leading batch dims), intensity
scale free (LK is invariant; detection thresholds assume [0, 255]-like scale,
handled by the caller).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PYR_K = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
_SCHARR_D = np.array([-1.0, 0.0, 1.0])  # derivative part
_SCHARR_S = np.array([3.0, 10.0, 3.0]) / 32.0  # smoothing part (OpenCV scale 1/32)


def _sep_conv2d(img: jnp.ndarray, kx: np.ndarray, ky: np.ndarray) -> jnp.ndarray:
    """Separable 2D convolution with replicate padding; img (..., H, W)."""
    dtype = img.dtype
    kxa = jnp.asarray(kx, dtype)
    kya = jnp.asarray(ky, dtype)
    rx = len(kx) // 2
    ry = len(ky) // 2
    x = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(0, 0), (rx, rx)], mode="edge")
    x = sum(kxa[i] * x[..., :, i : i + img.shape[-1]] for i in range(len(kx)))
    x = jnp.pad(x, [(0, 0)] * (img.ndim - 2) + [(ry, ry), (0, 0)], mode="edge")
    x = sum(kya[i] * x[..., i : i + img.shape[-2], :] for i in range(len(ky)))
    return x


import os as _os

# fused kernels on TPU (ops/pyramid_pallas.py); HYBVIO_NO_PALLAS=1 -> XLA path
USE_PALLAS = _os.environ.get("HYBVIO_NO_PALLAS", "0").lower() in ("", "0", "false")


def _pallas_ok(img) -> bool:
    if not USE_PALLAS or img.ndim != 2 or jax.default_backend() != "tpu":
        return False
    from ..ops.pyramid_pallas import PALLAS_AVAILABLE

    return PALLAS_AVAILABLE


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """One pyramid level down: Gaussian blur + 2x decimation (cv::pyrDown)."""
    if _pallas_ok(img):
        from ..ops.pyramid_pallas import pyr_down_pallas

        return pyr_down_pallas(img)
    blurred = _sep_conv2d(img, _PYR_K, _PYR_K)
    return blurred[..., ::2, ::2]


def build_pyramid(img: jnp.ndarray, max_level: int) -> List[jnp.ndarray]:
    """Levels 0..max_level (level 0 = input image)."""
    levels = [img]
    for _ in range(max_level):
        levels.append(pyr_down(levels[-1]))
    return levels


def scharr_gradients(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Ix, Iy) via Scharr 3x3, OpenCV-compatible scaling."""
    if _pallas_ok(img):
        from ..ops.pyramid_pallas import scharr_pallas

        return scharr_pallas(img)
    ix = _sep_conv2d(img, _SCHARR_D, _SCHARR_S)
    iy = _sep_conv2d(img, _SCHARR_S, _SCHARR_D)
    return ix, iy


def sobel_gradients(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Ix, Iy) via Sobel 3x3 (used by the GFTT detector; reference:
    src/tracker/feature_detector.cpp:31-88 uses Sobel shaders)."""
    d = np.array([-1.0, 0.0, 1.0])
    s = np.array([1.0, 2.0, 1.0])
    ix = _sep_conv2d(img, d, s)
    iy = _sep_conv2d(img, s, d)
    return ix, iy


def box_filter(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """size x size box sum (not normalized), replicate padding."""
    k = np.ones(size)
    return _sep_conv2d(img, k, k)


def bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation of img (H, W) at points xy (..., 2) in (x, y)
    pixel coordinates. Out-of-bounds clamped (callers check validity)."""
    H, W = img.shape[-2], img.shape[-1]
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = (x - x0).astype(img.dtype)
    fy = (y - y0).astype(img.dtype)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
