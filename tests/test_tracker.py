"""Tracker-core tests on rendered synthetic frames."""
import jax
import jax.numpy as jnp
import numpy as np

from hybvio_tpu.config import Parameters
from hybvio_tpu.geometry.cameras import build_pinhole
from hybvio_tpu.frontend.tracker import make_tracker
from hybvio_tpu.io.synthetic import (
    SYNTH_IMU_TO_CAMERA, generate_sequence, project_landmarks, render_frame,
)

W, H = 320, 240
FX = FY = 260.0


def make_frames(n_frames=10, seed=0):
    seq = generate_sequence(duration=4.0, imu_rate=100.0, frame_rate=10.0,
                            n_landmarks=250, seed=seed)
    frames = []
    projs = []
    for fi in range(n_frames):
        k = seq.frame_sample_idx[fi]
        pix, depth, vis = project_landmarks(
            seq.landmarks, seq.pos[k], seq.quat[k], SYNTH_IMU_TO_CAMERA,
            FX, FY, W / 2, H / 2, W, H)
        frames.append(render_frame(pix, depth, vis, W, H, blob_sigma=1.2))
        projs.append((pix, vis))
    return seq, frames, projs


def test_tracker_follows_landmarks():
    p = Parameters()
    p.tracker.maxTracks = 48
    p.tracker.focalLength = FX
    p.tracker.principalPointX = W / 2
    p.tracker.principalPointY = H / 2
    p.tracker.pyrLKWindowSize = 15
    p.tracker.pyrLKMaxLevel = 2
    p.tracker.gfttMinDistance = 20.0  # in scale units (min_dim/720)
    cam = build_pinhole(FX, FY, W / 2, H / 2, width=W, height=H)

    seq, frames, projs = make_frames(8)
    init_fn, track_frame = make_tracker(p, (cam,), max_tracks=48)
    track_frame = jax.jit(track_frame)

    ts = init_fn(jnp.asarray(frames[0]), t0=0.0)
    n0 = int(jnp.sum(ts.track_ids >= 0))
    assert n0 > 15, n0

    key = jax.random.PRNGKey(0)
    outs = []
    for fi in range(1, 8):
        key, k = jax.random.split(key)
        ts, out = track_frame(ts, jnp.asarray(frames[fi]), k, float(fi) * 0.1)
        outs.append(out)

    # most tracks should survive between consecutive frames
    last = outs[-1]
    assert int(last.n_tracks) > 10, int(last.n_tracks)

    # tracked positions should coincide with some projected landmark (<1.5 px)
    pix, vis = projs[7]
    live = np.asarray(last.track_ids) >= 0
    pts = np.asarray(last.pixels)[live, 0, :]
    d = np.linalg.norm(pts[:, None, :] - pix[None, vis, :], axis=-1).min(axis=1)
    assert np.median(d) < 1.5, np.median(d)

    # the camera is moving: keyframe should be True
    assert bool(last.keyframe)

    # track ids persist across frames for surviving tracks
    ids_prev = set(np.asarray(outs[-2].track_ids)[np.asarray(outs[-2].track_ids) >= 0].tolist())
    ids_last = set(np.asarray(last.track_ids)[live].tolist())
    assert len(ids_prev & ids_last) > 8


def test_tracker_stationary_keyframe():
    """Identical consecutive frames -> visually stationary -> not a keyframe
    (after the initial maxTrackLength warmup)."""
    p = Parameters()
    p.tracker.maxTracks = 32
    p.tracker.maxTrackLength = 3  # short warmup for the test
    p.tracker.focalLength = FX
    p.tracker.principalPointX = W / 2
    p.tracker.principalPointY = H / 2
    p.tracker.pyrLKWindowSize = 15
    p.tracker.pyrLKMaxLevel = 2
    p.tracker.gfttMinDistance = 20.0
    cam = build_pinhole(FX, FY, W / 2, H / 2, width=W, height=H)
    seq, frames, projs = make_frames(2, seed=1)
    img = frames[0]

    init_fn, track_frame = make_tracker(p, (cam,), max_tracks=32)
    track_frame = jax.jit(track_frame)
    ts = init_fn(jnp.asarray(img))
    key = jax.random.PRNGKey(1)
    for i in range(5):
        key, k = jax.random.split(key)
        ts, out = track_frame(ts, jnp.asarray(img), k, 0.1 * (i + 1))
    assert not bool(out.keyframe)
    assert float(out.ransac_score) > 0.9
