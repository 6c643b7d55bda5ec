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


def test_shared_frames_matches_tiled():
    """shared_frames=True (one unbatched frame broadcast inside the jitted
    step) must reproduce the tiled path bit-for-bit: same computation, the
    broadcast just moves from HBM staging into the vmap."""
    p, derived, cam = tiny_setup()
    B, steps, S = 4, 3, 6
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.rand(steps + 1, 64, 96), jnp.float32)
    gyro = jnp.asarray(0.02 * rng.randn(steps, B, S, 3), jnp.float32)

    results = {}
    for shared in (True, False):
        binit, bstep = make_batched_vio(p, derived, (cam,), batch_size=B,
                                        max_tracks=12, dtype=jnp.float32,
                                        shared_frames=shared)
        first = imgs[0] if shared else jnp.broadcast_to(imgs[0], (B, 64, 96))
        states = binit(first, np.full(B, 10.0), np.arange(B))
        for k in range(steps):
            imu = ImuBatch(
                t=jnp.asarray(np.tile(10.0 + (k * S + 1 + np.arange(S)) * 0.005,
                                      (B, 1)), jnp.float32),
                gyro=gyro[k],
                acc=jnp.asarray(np.tile([0.0, 0.0, 9.819], (B, S, 1)),
                                jnp.float32),
                valid=jnp.ones((B, S), bool),
            )
            img = imgs[k + 1] if shared else jnp.broadcast_to(
                imgs[k + 1], (B, 64, 96))
            states, out = bstep(states, imu, img)
        results[shared] = (np.asarray(out.position),
                           np.asarray(states.backend.ekf.m))
    np.testing.assert_allclose(results[True][0], results[False][0],
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(results[True][1], results[False][1],
                               rtol=1e-6, atol=1e-8)


def test_scan_matches_eager_loop():
    """lax.scan over frames (make_batched_scan — the one-dispatch offline
    throughput mode) must reproduce the eager per-frame dispatch loop: the
    scan body is the same vmapped vio_step."""
    from hybvio_tpu.parallel.batched import make_batched_scan

    p, derived, cam = tiny_setup()
    B, steps, S = 4, 4, 6
    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.rand(steps + 1, 64, 96), jnp.float32)
    gyro = jnp.asarray(0.02 * rng.randn(steps, B, S, 3), jnp.float32)

    def imu_at(k):
        return ImuBatch(
            t=jnp.asarray(np.tile(10.0 + (k * S + 1 + np.arange(S)) * 0.005,
                                  (B, 1)), jnp.float32),
            gyro=gyro[k],
            acc=jnp.asarray(np.tile([0.0, 0.0, 9.819], (B, S, 1)),
                            jnp.float32),
            valid=jnp.ones((B, S), bool),
        )

    # eager loop (shared frames)
    binit, bstep = make_batched_vio(p, derived, (cam,), batch_size=B,
                                    max_tracks=12, dtype=jnp.float32,
                                    shared_frames=True)
    states = binit(imgs[0], np.full(B, 10.0), np.arange(B))
    eager_pos = []
    for k in range(steps):
        states, out = bstep(states, imu_at(k), imgs[k + 1])
        eager_pos.append(np.asarray(out.position))
    eager_pos = np.stack(eager_pos)
    eager_m = np.asarray(states.backend.ekf.m)

    # one scan over the stacked sequence
    sinit, srun = make_batched_scan(p, derived, (cam,), batch_size=B,
                                    max_tracks=12, dtype=jnp.float32,
                                    shared_frames=True)
    states2 = sinit(imgs[0], np.full(B, 10.0), np.arange(B))
    imu_stack = jax.tree.map(lambda *xs: jnp.stack(xs),
                             *[imu_at(k) for k in range(steps)])
    states2, pos = srun(states2, imu_stack, imgs[1:])
    np.testing.assert_allclose(np.asarray(pos), eager_pos,
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(states2.backend.ekf.m), eager_m,
                               rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_mesh_sharded_matches_unsharded():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    pos_ref, m_ref = run_steps(mesh=None)
    pos_sh, m_sh = run_steps(mesh=make_mesh(8))
    assert np.isfinite(pos_sh).all()
    np.testing.assert_allclose(pos_sh, pos_ref, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(m_sh, m_ref, rtol=1e-6, atol=1e-8)


def test_sharded_ba_matches_single_device():
    """Multi-chip bundle adjustment (map-point axis sharded over the mesh,
    psum-reduced normal equations) must reproduce the single-device GN
    exactly (same Schur system, same deltas)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hybvio_tpu.slam.ba import BAProblem, ba_iterate, make_sharded_ba
    from hybvio_tpu.parallel.batched import make_mesh

    rng = np.random.RandomState(0)
    NK, MP = 6, 64  # MP divisible by the 8-device mesh
    # ground-truth scene: points in front of a forward-moving camera line
    gt_pts = np.stack([rng.uniform(-2, 2, MP), rng.uniform(-2, 2, MP),
                       rng.uniform(4, 8, MP)], 1)
    poses = np.zeros((NK, 7)); poses[:, 3] = 1.0
    poses[:, 0] = np.linspace(0, 1.0, NK)  # translate along x
    obs = np.zeros((NK, MP, 2)); mask = np.zeros((NK, MP), bool)
    for k in range(NK):
        rel = gt_pts - poses[k, :3]
        obs[k] = rel[:, :2] / rel[:, 2:3] + 1e-3 * rng.randn(MP, 2)
        mask[k] = True
    prior_rel = np.zeros((NK - 1, 7)); prior_rel[:, 3] = 1.0
    prior_rel[:, 0] = np.diff(poses[:, 0])
    problem = BAProblem(
        poses=jnp.asarray(poses + np.concatenate(
            [0.01 * rng.randn(NK, 3), np.zeros((NK, 4))], 1)),
        points=jnp.asarray(gt_pts + 0.05 * rng.randn(MP, 3)),
        obs_ip=jnp.asarray(obs), obs_mask=jnp.asarray(mask),
        pose_valid=jnp.ones(NK, bool), point_valid=jnp.ones(MP, bool),
        prior_rel=jnp.asarray(prior_rel), prior_mask=jnp.ones(NK - 1, bool),
        prior_w_pos=jnp.asarray(10.0), prior_w_rot=jnp.asarray(10.0))

    p1, x1, c1 = ba_iterate(problem, iterations=5)
    mesh = make_mesh(8)
    sharded = make_sharded_ba(mesh, iterations=5)
    p2, x2, c2 = sharded(problem)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)
    np.testing.assert_allclose(float(c1), float(c2), rtol=1e-5)
    # and it actually refined the scene
    assert float(c2) < 1e-3


def test_slam_session_with_sharded_ba():
    """The SLAM session runs unchanged with the multi-chip BA engaged
    (set_ba_mesh): keyframes insert, local BA refines on the 8-device mesh."""
    import jax.numpy as jnp
    import numpy as np

    from hybvio_tpu.config import Parameters
    from hybvio_tpu.parallel.batched import make_mesh
    from hybvio_tpu.slam.session import Slam

    p = Parameters()
    p.slam.keyframeDecisionAlways = True
    p.slam.applyLocalBundleAdjustment = True
    s = Slam(p, compute_descriptors=False)
    s.set_ba_mesh(make_mesh(8))

    rng = np.random.RandomState(0)
    F = 24
    gt_pts = np.stack([rng.uniform(-2, 2, F), rng.uniform(-2, 2, F),
                       rng.uniform(4, 8, F)], 1)
    ids = np.arange(F)
    for fi in range(8):
        pose = np.eye(4)
        pose[0, 3] = 0.15 * fi
        rel = gt_pts - pose[:3, 3]
        norm = rel[:, :2] / rel[:, 2:3] + 1e-3 * rng.randn(F, 2)
        s.add_frame(None, pose, ids, norm, float(fi) * 0.5, fi)
    assert len(s.kf_order) == 8
    tri = [mp for mp in s.points.values() if mp.triangulated]
    assert len(tri) >= 10
    err = np.array([np.linalg.norm(mp.position - gt_pts[mp.track_id])
                    for mp in tri])
    assert np.median(err) < 0.3, np.median(err)
