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
                     mesh: Optional[Mesh] = None, shared_frames: bool = False):
    """Build (batched_init, batched_step) where every state/input leaf gains a
    leading batch axis of size batch_size, optionally sharded over mesh
    ('data',).

    shared_frames=True takes ONE unbatched frame per step and broadcasts it
    across the B lanes INSIDE the jitted step (vmap in_axes=None): the
    broadcast is fused into the first consumer, so HBM holds one copy of each
    staged frame instead of B. At 752x480 stereo f32 that is ~2.9 MB/frame
    vs ~46 MB/frame at B=16 — the difference between a ~300-frame staged
    bench fitting comfortably and hitting the HBM ceiling, and it unlocks
    B=32/64. Per-lane IMU still carries the batch axis, so lane states
    diverge normally."""
    init_fn, vio_step = make_vio(params, derived, cameras,
                                 max_tracks=max_tracks, dtype=dtype)

    def batched_init(first_images, t0s, seeds):
        """first_images: (B, H, W) or a ((B,H,W), (B,H,W)) stereo pair —
        unbatched (H, W) / pair when shared_frames; t0s: (B,); seeds: (B,)
        int."""
        keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds, jnp.uint32))
        if isinstance(first_images, (tuple, list)):
            imgs = tuple(jnp.asarray(f) for f in first_images)
        else:
            imgs = jnp.asarray(first_images)
        img_axes = None if shared_frames else 0
        states = jax.vmap(lambda img, t0, k: init_fn(img, t0, k),
                          in_axes=(img_axes, 0, 0))(
            imgs, jnp.asarray(t0s, dtype), keys)
        if mesh is not None:
            sharding = NamedSharding(mesh, P("data"))
            states = jax.device_put(states, sharding)
        return states

    frame_axes = None if shared_frames else 0
    vstep = jax.vmap(vio_step, in_axes=(0, 0, frame_axes))

    if mesh is not None:
        sharding = NamedSharding(mesh, P("data"))
        # shared frames are replicated across the mesh (P() = no partition)
        frame_sh = NamedSharding(mesh, P()) if shared_frames else sharding
        batched_step = jax.jit(
            vstep,
            in_shardings=(sharding, sharding, frame_sh),
            out_shardings=(sharding, sharding),
        )
    else:
        batched_step = jax.jit(vstep)

    batched_step.vstep = vstep  # unjitted: composable under lax.scan
    return batched_init, batched_step


def make_batched_scan(params, derived, cameras, batch_size: int,
                      max_tracks: Optional[int] = None, dtype=jnp.float32,
                      shared_frames: bool = True):
    """(batched_init, scan_run) where scan_run folds a whole frame sequence
    into ONE jitted program via lax.scan over the per-frame step.

    scan_run(states, imu_stack, frames_stack) -> (states, positions):
      imu_stack    ImuBatch with a leading frame axis: t (F, B, S), ...
      frames_stack (F, H, W) per camera (shared_frames) or (F, B, H, W)
      positions    (F, B, 3)

    Rationale: the offline benchmark's eager loop dispatches one device call
    per frame; over a high-latency link (remote-TPU tunnel, ~32 ms RTT) the
    loop is dispatch-bound, not compute-bound. Scanning over the staged
    sequence makes throughput = pure device throughput — the TPU-idiomatic
    shape for the reference's "all sequences in parallel" offline benchmark
    (SURVEY.md section 2; reference analog: the main loop's per-frame
    processing, main.cpp:619-985, which has no such link to amortize).
    The per-frame step function is byte-identical to the eager path (the
    same vmapped vio_step), so trajectories agree to float tolerance.
    """
    batched_init, batched_step = make_batched_vio(
        params, derived, cameras, batch_size=batch_size,
        max_tracks=max_tracks, dtype=dtype, shared_frames=shared_frames)
    vstep = batched_step.vstep

    def scan_run(states, imu_stack, frames_stack):
        def body(st, xs):
            imu, fr = xs
            st, out = vstep(st, imu, fr)
            return st, out.position

        return jax.lax.scan(body, states, (imu_stack, frames_stack))

    return batched_init, jax.jit(scan_run)


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))
