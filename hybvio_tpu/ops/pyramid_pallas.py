"""Pallas TPU kernels: fused pyramid downsample and Scharr gradients.

The reference builds LK pyramids with cv::buildOpticalFlowPyramid and
gradients inside cv::calcOpticalFlowPyrLK (reference: src/tracker/
image_pyramid.cpp:28-49, optical_flow.cpp:10-58). The XLA path
(frontend/pyramid.py) is separable convs; each conv is a separate pass over
HBM. These kernels fuse the whole stencil per row band in VMEM:

  * pyr_down: 5-tap [1,4,6,4,1]/16 blur in x and y + 2x decimation — one
    image read, one half-size write (vs 2 conv passes + slice);
  * scharr: d=[-1,0,1] x s=[3,10,3]/32 cross-smoothed gradients — one read,
    two writes (vs 4 conv passes).

Dispatched from frontend/pyramid.py on TPU; interiors match the XLA path
exactly (global edge rows differ in padding order and are excluded by the LK
border checks)."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False

_PYR_K = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
_SCHARR_D = np.array([-1.0, 0.0, 1.0])
_SCHARR_S = np.array([3.0, 10.0, 3.0]) / 32.0


def _shift_x(a, s):
    if s == 0:
        return a
    if s > 0:
        return jnp.concatenate([a[:, s:], jnp.repeat(a[:, -1:], s, 1)], axis=1)
    return jnp.concatenate([jnp.repeat(a[:, :1], -s, 1), a[:, :s]], axis=1)


def _shift_y(a, s):
    if s == 0:
        return a
    if s > 0:
        return jnp.concatenate([a[s:, :], jnp.repeat(a[-1:, :], s, 0)], axis=0)
    return jnp.concatenate([jnp.repeat(a[:1, :], -s, 0), a[:s, :]], axis=0)


def _conv_sep(x, kx, ky):
    rx = len(kx) // 2
    ry = len(ky) // 2
    acc = sum(float(kx[i]) * _shift_x(x, i - rx) for i in range(len(kx)))
    return sum(float(ky[i]) * _shift_y(acc, i - ry) for i in range(len(ky)))


def _pyr_down_tile(img_ref, out_ref, *, halo: int, th: int):
    """Input band rows [2*i*th - halo, 2*(i+1)*th + halo); output (th, W/2)."""
    i = pl.program_id(0)
    x = img_ref[pl.ds(i * 2 * th, 2 * th + 2 * halo), :]
    blurred = _conv_sep(x, _PYR_K, _PYR_K)
    band = blurred[halo:halo + 2 * th, :]          # (2*th, 2*Wo)
    w2 = band.shape[1]
    # decimation as selection-matrix matmuls (neither strided slices nor
    # lane-splitting reshapes lower in Mosaic; these ride the MXU)
    dt = band.dtype
    ri = jax.lax.broadcasted_iota(jnp.int32, (th, 2 * th), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (th, 2 * th), 1)
    R = (rj == 2 * ri).astype(dt)                  # (th, 2*th) even rows
    ci = jax.lax.broadcasted_iota(jnp.int32, (w2, w2 // 2), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (w2, w2 // 2), 1)
    D = (ci == 2 * cj).astype(dt)                  # (w2, Wo) even cols
    hp = jax.lax.Precision.HIGHEST  # bit-exact selection (bf16 would round pixels)
    out_ref[:] = jnp.dot(jnp.dot(R, band, preferred_element_type=dt,
                                 precision=hp), D,
                         preferred_element_type=dt, precision=hp)


def pyr_down_pallas(img: jnp.ndarray, tile_rows: int = 32,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused blur+decimate; img (H, W) -> (H//2, W//2) like pyr_down."""
    assert PALLAS_AVAILABLE
    H, W = img.shape
    Ho, Wo = (H + 1) // 2, (W + 1) // 2  # == blurred[::2, ::2] shape
    halo = 2
    th = tile_rows
    n_tiles = -(-Ho // th)
    Hp = n_tiles * th * 2
    # pad to even width so the kernel can decimate
    img_p = jnp.pad(img, ((halo, Hp - H + halo), (0, 2 * Wo - W)),
                    mode="edge")
    out = pl.pallas_call(
        partial(_pyr_down_tile, halo=halo, th=th),
        out_shape=jax.ShapeDtypeStruct((n_tiles * th, Wo), img.dtype),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(img_p.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((th, Wo), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(img_p)
    return out[:Ho]


def _scharr_tile(img_ref, gx_ref, gy_ref, *, halo: int, th: int):
    i = pl.program_id(0)
    x = img_ref[pl.ds(i * th, th + 2 * halo), :]
    gx = _conv_sep(x, _SCHARR_D, _SCHARR_S)
    gy = _conv_sep(x, _SCHARR_S, _SCHARR_D)
    gx_ref[:] = gx[halo:halo + th, :]
    gy_ref[:] = gy[halo:halo + th, :]


def scharr_pallas(img: jnp.ndarray, tile_rows: int = 64,
                  interpret: bool = False):
    """(Ix, Iy) Scharr gradients in one fused pass."""
    assert PALLAS_AVAILABLE
    H, W = img.shape
    halo = 1
    th = tile_rows
    n_tiles = -(-H // th)
    Hp = n_tiles * th
    img_p = jnp.pad(img, ((halo, Hp - H + halo), (0, 0)), mode="edge")
    gx, gy = pl.pallas_call(
        partial(_scharr_tile, halo=halo, th=th),
        out_shape=[jax.ShapeDtypeStruct((Hp, W), img.dtype),
                   jax.ShapeDtypeStruct((Hp, W), img.dtype)],
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(img_p.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((th, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((th, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        interpret=interpret,
    )(img_p)
    return gx[:H], gy[:H]
