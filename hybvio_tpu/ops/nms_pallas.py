"""Pallas TPU kernel: greedy min-distance candidate selection.

The detector's final stage (reference: feature_detector.cpp:620-636
applyMinDistance) walks candidates in response order and keeps those not
within min_distance of an already-kept candidate — inherently sequential.
As a lax.scan this costs one tiny launch per step; here the whole loop runs
in VMEM inside one kernel: ~K vector ops on a (K,) mask.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False


def _greedy_kernel(d2_ref, ok_ref, taken_ref, *, k: int, min_d2: float):
    ok = ok_ref[:]              # (1, K) candidate eligibility (float 0/1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, taken):
        # near_sel = any(taken & d2[i] < min_d2); row loaded from the VMEM ref
        row = d2_ref[pl.ds(i, 1), :]  # (1, K)
        near = jnp.sum(jnp.where((row < min_d2) & (taken > 0.5), 1.0, 0.0))
        ok_i = jnp.sum(jnp.where(iota == i, ok, 0.0))
        take = jnp.where((near == 0.0) & (ok_i > 0.5), 1.0, 0.0)
        return jnp.where(iota == i, take, taken)

    taken = jax.lax.fori_loop(
        0, k, body, jnp.zeros((1, k), ok.dtype))
    taken_ref[:] = taken


def greedy_min_distance_pallas(d2: jnp.ndarray, cand_ok: jnp.ndarray,
                               min_d2: float,
                               interpret: bool = False) -> jnp.ndarray:
    """taken (K,) bool: greedy selection in index order (callers pass
    response-sorted candidates). d2: (K, K); cand_ok: (K,) bool."""
    assert PALLAS_AVAILABLE
    k = d2.shape[0]
    dtype = d2.dtype
    okf = cand_ok.astype(dtype)[None, :]
    taken = pl.pallas_call(
        partial(_greedy_kernel, k=k, min_d2=float(min_d2)),
        out_shape=jax.ShapeDtypeStruct((1, k), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(d2, okf)
    return taken[0] > 0.5
