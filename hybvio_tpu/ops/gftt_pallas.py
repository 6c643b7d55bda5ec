"""Pallas TPU kernel: fused Shi-Tomasi corner response.

The reference computes the GFTT response as a chain of GLSL shader passes
(Sobel -> structure matrix -> box filter -> min-eigenvalue; reference:
src/tracker/feature_detector.cpp:31-255). The XLA version (frontend/gftt.py)
is a chain of separable convolutions that XLA fuses reasonably well; this
Pallas kernel fuses the WHOLE stencil into one VMEM-resident pass per row
band: gradients, products, box sums and the eigenvalue response never touch
HBM in between — one image read, one response write.

frontend.gftt.corner_response dispatches here on TPU; elsewhere it uses the
XLA path. Interior values match the XLA path exactly (boundary rows within
the stencil radius differ in padding order; the detector's 5-px margin
discards those anyway).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:  # pallas import can fail on some backends; the caller falls back
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False


def _shift_x(a, s):
    """Shift columns so out[:, j] = a[:, j + s], edge-replicated."""
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


def _response_tile(img_ref, out_ref, *, block_size: int, halo: int, th: int):
    """Kernel body: full padded image resident in VMEM; each grid step
    computes one (th, W) output band from rows [i*th, i*th + th + 2*halo)."""
    i = pl.program_id(0)
    x = img_ref[pl.ds(i * th, th + 2 * halo), :]

    # UNNORMALIZED Sobel like the reference shaders (weights +-1, +-2, no
    # 1/4 scaling, feature_detector.cpp:47-65) — gfttMinResponse units
    dx = _shift_x(x, 1) - _shift_x(x, -1)
    ix = _shift_y(dx, 1) + 2.0 * dx + _shift_y(dx, -1)
    dy = _shift_y(x, 1) - _shift_y(x, -1)
    iy = _shift_x(dy, 1) + 2.0 * dy + _shift_x(dy, -1)

    # structure matrix + normalized box filter (block_size taps per axis)
    def box(a):
        r = block_size // 2
        acc = a if r == 0 else sum(_shift_x(a, s) for s in range(-r, r + 1))
        acc = acc if r == 0 else sum(_shift_y(acc, s) for s in range(-r, r + 1))
        return acc / (block_size * block_size)

    sxx = box(ix * ix)
    syy = box(iy * iy)
    sxy = box(ix * iy)
    tr2 = 0.5 * (sxx + syy)
    det = sxx * syy - sxy * sxy
    disc = jnp.sqrt(jnp.maximum(tr2 * tr2 - det, 0.0))
    resp = tr2 - disc
    out_ref[:] = resp[halo:halo + th, :]


def corner_response_pallas(img: jnp.ndarray, block_size: int = 3,
                           tile_rows: int = 64,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused corner response via Pallas. img: (H, W) float. Any H (padded to
    a multiple of tile_rows internally). Set interpret=True to run the kernel
    in interpreter mode on CPU (tests)."""
    assert PALLAS_AVAILABLE
    H, W = img.shape
    halo = 1 + block_size // 2  # sobel reach (1) + box radius
    th = tile_rows
    n_tiles = -(-H // th)
    Hp = n_tiles * th
    img_p = jnp.pad(img, ((halo, Hp - H + halo), (0, 0)), mode="edge")

    out = pl.pallas_call(
        partial(_response_tile, block_size=block_size, halo=halo, th=th),
        out_shape=jax.ShapeDtypeStruct((Hp, W), img.dtype),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(img_p.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((th, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(img_p)
    return out[:H]
