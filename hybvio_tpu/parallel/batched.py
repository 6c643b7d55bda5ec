"""Batched multi-sequence VIO over a device mesh.

The reference is a single-process robotics pipeline with no distributed
runtime (SURVEY.md section 2); the TPU-native scaling mode is data parallelism
over independent sequences: one chip runs B sequences via vmap, and a
jax.sharding.Mesh shards the batch across chips over ICI (reference batched
benchmark: all EuRoC sequences in parallel). There is no cross-sequence
communication, so XLA inserts no collectives — the mesh exists for placement.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..odometry.vio import make_vio


def make_batched_vio(params, derived, cameras, batch_size: int,
                     max_tracks: Optional[int] = None, dtype=jnp.float32,
                     mesh: Optional[Mesh] = None):
    """Build (batched_init, batched_step) where every state/input leaf gains a
    leading batch axis of size batch_size, optionally sharded over mesh
    ('data',)."""
    init_fn, vio_step = make_vio(params, derived, cameras,
                                 max_tracks=max_tracks, dtype=dtype)

    def batched_init(first_images, t0s, seeds):
        """first_images: (B, H, W) or a ((B,H,W), (B,H,W)) stereo pair;
        t0s: (B,); seeds: (B,) int."""
        keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds, jnp.uint32))
        if isinstance(first_images, (tuple, list)):
            imgs = tuple(jnp.asarray(f) for f in first_images)
        else:
            imgs = jnp.asarray(first_images)
        states = jax.vmap(lambda img, t0, k: init_fn(img, t0, k))(
            imgs, jnp.asarray(t0s, dtype), keys)
        if mesh is not None:
            sharding = NamedSharding(mesh, P("data"))
            states = jax.device_put(states, sharding)
        return states

    vstep = jax.vmap(vio_step)

    if mesh is not None:
        sharding = NamedSharding(mesh, P("data"))
        batched_step = jax.jit(
            vstep,
            in_shardings=(sharding, sharding, sharding),
            out_shardings=(sharding, sharding),
        )
    else:
        batched_step = jax.jit(vstep)

    return batched_init, batched_step


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))
