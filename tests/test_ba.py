"""Bundle adjustment tests: synthetic multi-keyframe scene, perturbed poses
and points must converge back to ground truth."""
import jax
import jax.numpy as jnp
import numpy as np

from hybvio_tpu.slam.ba import (
    BAProblem, _relative_pose, ba_iterate, triangulate_points_linear,
)
from hybvio_tpu.geometry.quaternion import quat_normalize


def make_scene(NK=6, MP=30, seed=0):
    rng = np.random.RandomState(seed)
    poses = np.zeros((NK, 7))
    for k in range(NK):
        poses[k, :3] = [k * 0.4, 0.05 * rng.randn(), 0.02 * rng.randn()]
        q = np.array([1.0, 0, 0, 0]) + 0.03 * rng.randn(4)
        poses[k, 3:] = q / np.linalg.norm(q)
    points = np.stack([
        4 * rng.rand(MP) - 2 + 1.0, 4 * rng.rand(MP) - 2, 4 + 2 * rng.rand(MP)], axis=1)

    from hybvio_tpu.geometry.quaternion import quat_to_rmat
    obs = np.zeros((NK, MP, 2))
    mask = np.zeros((NK, MP), bool)
    for k in range(NK):
        R = np.asarray(quat_to_rmat(jnp.asarray(poses[k, 3:])))  # cam-to-world
        pc = (points - poses[k, :3]) @ R  # world->cam = R^T
        z = pc[:, 2]
        ok = z > 0.5
        obs[k, ok] = pc[ok, :2] / z[ok, None]
        mask[k] = ok
    return poses, points, obs, mask


def test_ba_converges_to_ground_truth():
    NK, MP = 6, 30
    poses_gt, points_gt, obs, mask = make_scene(NK, MP)
    rng = np.random.RandomState(1)

    poses0 = poses_gt.copy()
    poses0[1:, :3] += 0.05 * rng.randn(NK - 1, 3)
    q = poses0[1:, 3:] + 0.01 * rng.randn(NK - 1, 4)
    poses0[1:, 3:] = q / np.linalg.norm(q, axis=1, keepdims=True)
    points0 = points_gt + 0.2 * rng.randn(MP, 3)

    rel = np.stack([
        np.asarray(_relative_pose(jnp.asarray(poses_gt[k]), jnp.asarray(poses_gt[k + 1])))
        for k in range(NK - 1)])

    problem = BAProblem(
        poses=jnp.asarray(poses0), points=jnp.asarray(points0),
        obs_ip=jnp.asarray(obs), obs_mask=jnp.asarray(mask),
        pose_valid=jnp.ones(NK, bool), point_valid=jnp.ones(MP, bool),
        prior_rel=jnp.asarray(rel), prior_mask=jnp.ones(NK - 1, bool),
        prior_w_pos=jnp.asarray(50.0), prior_w_rot=jnp.asarray(500.0),
    )
    poses, points, cost = ba_iterate(problem, iterations=12)
    pose_err = np.linalg.norm(np.asarray(poses)[:, :3] - poses_gt[:, :3], axis=1)
    pt_err = np.linalg.norm(np.asarray(points) - points_gt, axis=1)
    assert pose_err.max() < 5e-3, pose_err
    assert np.median(pt_err) < 1e-2, np.median(pt_err)
    assert float(cost) < 1e-8


def test_ba_masked_invariance():
    """Invalid poses/points must not affect the valid part."""
    NK, MP = 5, 20
    poses_gt, points_gt, obs, mask = make_scene(NK, MP, seed=2)
    rng = np.random.RandomState(3)
    poses0 = poses_gt.copy()
    poses0[1:, :3] += 0.03 * rng.randn(NK - 1, 3)
    points0 = points_gt + 0.1 * rng.randn(MP, 3)
    rel = np.stack([
        np.asarray(_relative_pose(jnp.asarray(poses_gt[k]), jnp.asarray(poses_gt[k + 1])))
        for k in range(NK - 1)])

    def solve(NK2, MP2):
        p = np.zeros((NK2, 7)); p[:, 3] = 1.0
        p[:NK] = poses0
        pts = np.zeros((MP2, 3)); pts[:MP] = points0
        o = np.zeros((NK2, MP2, 2)); o[:NK, :MP] = obs
        msk = np.zeros((NK2, MP2), bool); msk[:NK, :MP] = mask
        relp = np.zeros((NK2 - 1, 7)); relp[:, 3] = 1.0
        relp[:NK - 1] = rel
        pm = np.zeros(NK2 - 1, bool); pm[:NK - 1] = True
        prob = BAProblem(
            poses=jnp.asarray(p), points=jnp.asarray(pts),
            obs_ip=jnp.asarray(o), obs_mask=jnp.asarray(msk),
            pose_valid=jnp.asarray(np.arange(NK2) < NK),
            point_valid=jnp.asarray(np.arange(MP2) < MP),
            prior_rel=jnp.asarray(relp), prior_mask=jnp.asarray(pm),
            prior_w_pos=jnp.asarray(50.0), prior_w_rot=jnp.asarray(500.0))
        return ba_iterate(prob, iterations=8)

    poses_a, points_a, _ = solve(NK, MP)
    poses_b, points_b, _ = solve(NK + 3, MP + 10)
    np.testing.assert_allclose(np.asarray(poses_b)[:NK], np.asarray(poses_a), atol=1e-8)
    np.testing.assert_allclose(np.asarray(points_b)[:MP], np.asarray(points_a), atol=1e-8)


def test_triangulate_points_linear():
    NK, MP = 5, 25
    poses_gt, points_gt, obs, mask = make_scene(NK, MP, seed=4)
    pts, ok = triangulate_points_linear(
        jnp.asarray(poses_gt), jnp.asarray(obs), jnp.asarray(mask))
    sel = np.asarray(ok)
    err = np.linalg.norm(np.asarray(pts)[sel] - points_gt[sel], axis=1)
    assert np.median(err) < 1e-6
