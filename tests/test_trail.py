"""Trail (EKFStateIndex) bookkeeping tests."""
import jax
import jax.numpy as jnp
import numpy as np

from hybvio_tpu.config import Parameters
from hybvio_tpu.odometry import trail as tr


def make_trail(trail_len=4, T=6, hybrid=2):
    p = Parameters()
    p.odometry.cameraTrailLength = trail_len
    p.odometry.hybridMapSize = hybrid
    return p.odometry, tr.init_trail(p.odometry, T)


def ids(*v):
    return jnp.asarray(v, dtype=jnp.int32)


def push_frame(trail, po, track_ids, pts, t, num):
    """Simulate one keyframe cycle: insert features into head then push."""
    T = trail.kf_track_id.shape[1]
    valid = track_ids >= 0
    norm = jnp.zeros((T, 1, 2)).at[:, 0, :].set(pts)
    trail = tr.insert_head_features(trail, track_ids, norm, pts, valid, timestamp=jnp.asarray(float(t)))
    removed, counter = tr.removed_keyframe_index(trail, track_ids, po)
    trail = trail._replace(frame_counter=counter)
    trail = tr.push_head_keyframe(trail, removed, num, jnp.asarray(float(t)))
    return trail, int(removed)


def test_push_and_exists():
    po, trail = make_trail()
    tids = ids(1, 2, 3, -1, -1, -1)
    pts = jnp.asarray(np.random.RandomState(0).rand(6, 2))
    trail, removed = push_frame(trail, po, tids, pts, 1.0, 1)
    # buffer not full -> dropped index = K-1
    assert removed == po.cameraTrailLength  # K-1 = 4
    # after push, old head is at slot 1 (raw storage check; feature_exists is
    # head-anchored and by design sees nothing while the new head is empty)
    np.testing.assert_array_equal(np.asarray(trail.kf_track_id[1, :3]), [1, 2, 3])
    assert not bool(jnp.any(trail.kf_track_id[0] >= 0))  # new head empty
    assert not bool(jnp.any(trail.kf_track_id[2:] >= 0))
    # once the head is refilled, existence is contiguous from the head
    valid = tids >= 0
    trail2 = tr.insert_head_features(
        trail, tids, jnp.zeros((6, 1, 2)), pts, valid, timestamp=jnp.asarray(2.0))
    ex = tr.feature_exists(trail2, tids)
    assert bool(jnp.all(ex[:2, :3]))


def test_no_gaps_invariant():
    po, trail = make_trail()
    pts = jnp.asarray(np.random.RandomState(1).rand(6, 2))
    # track 1 exists at keyframes 1,2 then missing at 3 then (stale id) at 4
    tids = ids(1, -1, -1, -1, -1, -1)
    trail, _ = push_frame(trail, po, tids, pts, 1.0, 1)
    trail, _ = push_frame(trail, po, ids(-1, -1, -1, -1, -1, -1), pts, 2.0, 2)
    trail, _ = push_frame(trail, po, tids, pts, 3.0, 3)
    # head must hold current features for existence queries (as in the real flow)
    trail = tr.insert_head_features(
        trail, tids, jnp.zeros((6, 1, 2)), pts, tids >= 0, timestamp=jnp.asarray(4.0))
    ex = tr.feature_exists(trail, tids)
    # head + keyframe 1 have it, keyframe 2 doesn't -> contiguity cuts 3
    assert bool(ex[0, 0]) and bool(ex[1, 0])
    assert not bool(ex[2, 0])
    assert not bool(ex[3, 0])


def test_gap_selection_and_mark_used():
    po, trail = make_trail()
    tids = ids(7, -1, -1, -1, -1, -1)
    rng = np.random.RandomState(2)
    for k in range(3):
        trail, _ = push_frame(trail, po, tids, jnp.asarray(rng.rand(6, 2)), 1.0 + k, k + 1)
    # current frame's features go into the head before the visual update
    trail = tr.insert_head_features(
        trail, tids, jnp.zeros((6, 1, 2)), jnp.asarray(rng.rand(6, 2)), tids >= 0,
        timestamp=jnp.asarray(4.0))
    sel, exists = tr.select_track_poses(trail, jnp.asarray(0), tids, tr.SAMPLING_GAP, jax.random.PRNGKey(0))
    # exists at head + keyframes 1..3
    np.testing.assert_array_equal(np.asarray(exists), [True, True, True, True, False])
    np.testing.assert_array_equal(np.asarray(sel), np.asarray(exists))
    trail = tr.mark_track_used(trail, jnp.asarray(0), sel, tr.SAMPLING_GAP, tids)
    sel2, _ = tr.select_track_poses(trail, jnp.asarray(0), tids, tr.SAMPLING_GAP, jax.random.PRNGKey(0))
    # after marking: only the oldest (start index) is selected
    np.testing.assert_array_equal(np.asarray(sel2), [False, False, False, True, False])


def test_hanoi_removal_schedule():
    """With a full trail, the dropped index follows the Hanoi bit schedule."""
    p = Parameters()
    p.odometry.cameraTrailLength = 6
    p.odometry.cameraTrailHanoiLength = 2
    po = p.odometry
    T = 3
    trail = tr.init_trail(po, T)
    tids = ids(1, 2, 3)
    rng = np.random.RandomState(3)
    removed_seq = []
    for k in range(12):
        trail, removed = push_frame(trail, po, tids, jnp.asarray(rng.rand(T, 2)), 1.0 + k, k + 1)
        removed_seq.append(removed)
    K = po.cameraTrailLength + 1  # 7
    # the first few fills drop K-1 (free slots); once full, Hanoi kicks in:
    # counter odd -> drop K-2 (bit0), counter %4==2 -> K-1... pattern from the
    # reference: removedIdx = K-1-hanoiLen+i for lowest set bit i
    full = removed_seq[K - 1:]
    # valid drops: K-1 (no bit), or K-1-hanoiLen+i for lowest set bit i
    allowed = {K - 1} | {K - 1 - 2 + i for i in range(2)}  # {6, 4, 5}
    for r in full:
        assert r in allowed, (r, allowed)
    assert any(r == K - 1 - 2 for r in full)  # bit-0 drops occur


def test_prune_removes_untracked():
    po, trail = make_trail()
    rng = np.random.RandomState(4)
    trail, _ = push_frame(trail, po, ids(1, 2, -1, -1, -1, -1), jnp.asarray(rng.rand(6, 2)), 1.0, 1)
    trail, _ = push_frame(trail, po, ids(1, 2, -1, -1, -1, -1), jnp.asarray(rng.rand(6, 2)), 2.0, 2)
    # now track 2 dies; head has only track 1
    cur = ids(1, -1, -1, -1, -1, -1)
    T = 6
    valid = cur >= 0
    norm = jnp.zeros((T, 1, 2))
    trail = tr.insert_head_features(trail, cur, norm, jnp.zeros((T, 2)), valid, timestamp=jnp.asarray(3.0))
    trail = tr.prune(trail, cur)
    ex = tr.feature_exists(trail, ids(2, -1, -1, -1, -1, -1))
    assert not bool(jnp.any(ex))  # note: slot mismatch anyway; check stored ids
    assert not bool(jnp.any(trail.kf_track_id == 2))


def test_offer_map_point():
    po, trail = make_trail(hybrid=2)
    idx1, trail = tr.offer_map_point(trail, 5)
    idx2, trail = tr.offer_map_point(trail, 9)
    idx3, trail = tr.offer_map_point(trail, 11)
    assert int(idx1) == 0 and int(idx2) == 1 and int(idx3) == -1
    np.testing.assert_array_equal(np.asarray(trail.map_point_ids), [5, 9])


def test_track_scores_path_length():
    po, trail = make_trail()
    tids = ids(1, -1, -1, -1, -1, -1)
    pts = [jnp.zeros((6, 2)), jnp.ones((6, 2)), 3.0 * jnp.ones((6, 2))]
    for k in range(3):
        trail, _ = push_frame(trail, po, tids, pts[k], 1.0 + k, k + 1)
    trail = tr.insert_head_features(
        trail, tids, jnp.zeros((6, 1, 2)), 6.0 * jnp.ones((6, 2)), tids >= 0,
        timestamp=jnp.asarray(4.0))
    scores = tr.track_scores(trail, tids, tr.SAMPLING_GAP)
    # path: head (6,6) -> kf1 (3,3) -> kf2 (1,1) -> kf3 (0,0): L1 = 6 + 4 + 2 = 12
    np.testing.assert_allclose(float(scores[0]), 12.0)
    assert float(scores[1]) == 0.0
