"""Pallas TPU kernel: per-feature image patch extraction via DMA.

The LK tracker (frontend/lk.py) and subpixel refiner pull one contiguous
(ps, ps) window per feature out of a full image. Expressed as a vmapped
`jax.lax.dynamic_slice`, XLA lowers this to a gather, which on TPU runs at
~3 GB/s effective — measured at 60% of the whole stereo VIO step. The DMA
engines, by contrast, are built for exactly this: strided HBM->VMEM block
copies with runtime offsets.

Mosaic requires HBM slices to be tiling-aligned ((8, 128) for f32), so the
kernel aligns each window's origin down to the tile grid, DMAs a slightly
larger aligned block into VMEM scratch, and extracts the requested (ps, ps)
window with an in-VMEM dynamic slice. Scratch is double-buffered: the copy
for feature i+1 is in flight while feature i is extracted. Indices arrive
via scalar prefetch (SMEM) so copy addresses never touch VMEM.

Exposed as `gather_patches_pallas(img (H,W), y0 (N,), x0 (N,), ps)` with a
custom_vmap rule mapping straight onto the batched kernel, because every
caller sits under `jax.vmap` over sequences.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False

_SUB = 8    # f32 sublane tile
_LANE = 128  # lane tile


def _block_dims(ps: int):
    # aligned scratch block: rows cover ps + up to (_SUB-1) shift,
    # cols cover ps + up to (_LANE-1) shift, both rounded to the tile
    br = -(-(ps + _SUB - 1) // _SUB) * _SUB
    bc = -(-(ps + _LANE - 1) // _LANE) * _LANE
    return br, bc


def _kernel(y0_ref, x0_ref, img_ref, out_ref, scratch, sems, *, ps, br, bc,
            h_max, w_max):
    b = pl.program_id(0)
    n = pl.program_id(1)
    nn = pl.num_programs(1)

    def aligned(i):
        y0 = y0_ref[b, i]
        x0 = x0_ref[b, i]
        ya = jnp.minimum((y0 // _SUB) * _SUB, h_max)
        xa = jnp.minimum((x0 // _LANE) * _LANE, w_max)
        # h_max/w_max are tile-multiples by construction; tell Mosaic
        return pl.multiple_of(ya, _SUB), pl.multiple_of(xa, _LANE)

    def copy(i, slot):
        ya, xa = aligned(i)
        return pltpu.make_async_copy(
            img_ref.at[b, pl.ds(ya, br), pl.ds(xa, bc)],
            scratch.at[slot],
            sems.at[slot],
        )

    slot = jax.lax.rem(n, jnp.int32(2))

    @pl.when(n == 0)
    def _():
        copy(n, slot).start()

    @pl.when(n + 1 < nn)
    def _():
        copy(n + 1, 1 - slot).start()

    copy(n, slot).wait()
    y0 = y0_ref[b, n]
    x0 = x0_ref[b, n]
    ya, xa = aligned(n)
    # residual shifts; ry can exceed the tile when ya was clamped by h_max,
    # but never br - ps (see _gather_batched bounds algebra). Mosaic needs
    # static sublane offsets, so branch over the possible row shifts.
    ry = y0 - ya
    rx = x0 - xa

    def shifted(r):
        def f():
            return scratch[slot, r:r + ps, :]

        return f

    rows = jax.lax.switch(
        ry, [shifted(r) for r in range(br - ps + 1)])  # (ps, bc)
    # dynamic lane shift: circular-roll left by rx, then keep the first ps
    rolled = pltpu.roll(rows, -rx, axis=1)
    out_ref[0, 0] = rolled[:, :ps]


@functools.partial(jax.jit, static_argnames=("ps", "interpret"))
def _gather_batched(img, y0, x0, ps: int, interpret: bool = False):
    """img: (B, H, W); y0/x0: (B, N) int32 pre-clamped to [0, dim-ps].
    Returns (B, N, ps, ps) patches."""
    B, H, W = img.shape
    N = y0.shape[1]
    br, bc = _block_dims(ps)
    # aligned block origin bounds (in the padded HBM layout XLA rounds the
    # trailing dims up to the tile grid, so the padded extent is usable);
    # blocks never exceed the padded extent (small pyramid levels)
    h_pad = ((H + _SUB - 1) // _SUB) * _SUB
    w_pad = ((W + _LANE - 1) // _LANE) * _LANE
    br = min(br, h_pad)
    bc = min(bc, w_pad)
    if br < ps or bc < ps:
        raise ValueError(f"patch {ps} exceeds image {H}x{W}")
    h_max = h_pad - br
    w_max = w_pad - bc
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, N),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, ps, ps), lambda b, n, y0, x0: (b, n, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, br, bc), img.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, ps=ps, br=br, bc=bc, h_max=h_max,
                          w_max=w_max),
        out_shape=jax.ShapeDtypeStruct((B, N, ps, ps), img.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(y0, x0, img)


def _gather_fallback(img, y0, x0, ps: int):
    def one(yy, xx):
        return jax.lax.dynamic_slice(img, (yy, xx), (ps, ps))

    return jax.vmap(one)(y0, x0)


def _make_custom(ps: int):
    @jax.custom_batching.custom_vmap
    def gather(img, y0, x0):
        return _gather_batched(img[None], y0[None], x0[None], ps)[0]

    @gather.def_vmap
    def _rule(axis_size, in_batched, img, y0, x0):  # noqa: ANN001
        img_b, y_b, x_b = in_batched
        if not img_b:
            img = jnp.broadcast_to(img[None], (axis_size,) + img.shape)
        if not y_b:
            y0 = jnp.broadcast_to(y0[None], (axis_size,) + y0.shape)
        if not x_b:
            x0 = jnp.broadcast_to(x0[None], (axis_size,) + x0.shape)
        return _gather_batched(img, y0, x0, ps), True

    return gather


_CUSTOM_CACHE: dict = {}


def gather_patches_pallas(img, y0, x0, ps: int):
    """(N, ps, ps) patches of img (H, W) at integer origins y0/x0 (N,).

    Origins must be pre-clamped to [0, dim - ps]. vmap over a leading batch
    axis dispatches to one batched kernel launch."""
    fn = _CUSTOM_CACHE.get(ps)
    if fn is None:
        fn = _CUSTOM_CACHE[ps] = _make_custom(ps)
    return fn(img, y0.astype(jnp.int32), x0.astype(jnp.int32))
