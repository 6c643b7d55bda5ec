"""Data-parallel multi-sequence execution over a jax.sharding.Mesh: sharded
results must equal the unsharded vmap results (the conftest provides 8
virtual CPU devices)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybvio_tpu.config import DerivedParameters, Parameters
from hybvio_tpu.geometry.cameras import build_pinhole
from hybvio_tpu.io.synthetic import SYNTH_IMU_TO_CAMERA
from hybvio_tpu.odometry.backend import ImuBatch
from hybvio_tpu.parallel.batched import make_batched_vio, make_mesh


def tiny_setup():
    p = Parameters()
    p.odometry.cameraTrailLength = 4
    p.tracker.maxTracks = 12
    p.odometry.maxVisualUpdates = 4
    p.tracker.focalLength = 80.0
    p.tracker.principalPointX = 48.0
    p.tracker.principalPointY = 32.0
    p.tracker.pyrLKWindowSize = 9
    p.tracker.pyrLKMaxLevel = 1
    p.tracker.gfttMinDistance = 20.0
    p.odometry.imuToCameraMatrix = tuple(SYNTH_IMU_TO_CAMERA.T.flatten())
    derived = DerivedParameters.from_parameters(p)
    cam = build_pinhole(80.0, 80.0, 48.0, 32.0, width=96, height=64,
                        dtype=jnp.float32)
    return p, derived, cam


def run_steps(mesh, B=8, steps=3):
    p, derived, cam = tiny_setup()
    binit, bstep = make_batched_vio(p, derived, (cam,), batch_size=B,
                                    max_tracks=12, dtype=jnp.float32,
                                    mesh=mesh)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(steps + 1, B, 64, 96), jnp.float32)
    states = binit(imgs[0], np.full(B, 10.0), np.arange(B))
    S = 6
    outs = []
    for k in range(steps):
        imu = ImuBatch(
            t=jnp.asarray(np.tile(10.0 + (k * S + 1 + np.arange(S)) * 0.005,
                                  (B, 1)), jnp.float32),
            gyro=jnp.asarray(0.01 * np.ones((B, S, 3)), jnp.float32),
            acc=jnp.asarray(np.tile([0.0, 0.0, 9.819], (B, S, 1)),
                            jnp.float32),
            valid=jnp.ones((B, S), bool),
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P("data"))
            imu = jax.device_put(imu, sh)
            img = jax.device_put(imgs[k + 1], sh)
        else:
            img = imgs[k + 1]
        states, out = bstep(states, imu, img)
    return np.asarray(out.position), np.asarray(states.backend.ekf.m)


@pytest.mark.slow
def test_mesh_sharded_matches_unsharded():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    pos_ref, m_ref = run_steps(mesh=None)
    pos_sh, m_sh = run_steps(mesh=make_mesh(8))
    assert np.isfinite(pos_sh).all()
    np.testing.assert_allclose(pos_sh, pos_ref, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(m_sh, m_ref, rtol=1e-6, atol=1e-8)
