"""8-bit frame ingestion: uint8 frames ship raw to the device and are
normalized inside the jitted step (odometry/vio.py normalize_input) — 1/4 the
host->device bytes of pre-normalized float32 (reference: 8-bit image
ingestion + pipeline conversion, image.cpp:345-367)."""
import numpy as np
import pytest

from hybvio_tpu.config import DerivedParameters, Parameters
from hybvio_tpu.geometry.cameras import build_pinhole
from hybvio_tpu.io.synthetic import SYNTH_IMU_TO_CAMERA


def _tiny_params(width=96, height=64):
    p = Parameters()
    p.odometry.cameraTrailLength = 4
    p.tracker.maxTracks = 12
    p.odometry.maxVisualUpdates = 4
    p.tracker.focalLength = 80.0
    p.tracker.principalPointX = width / 2
    p.tracker.principalPointY = height / 2
    p.tracker.pyrLKWindowSize = 9
    p.tracker.pyrLKMaxLevel = 1
    p.tracker.gfttMinDistance = 40.0
    p.odometry.imuToCameraMatrix = tuple(SYNTH_IMU_TO_CAMERA.T.flatten())
    return p


def test_uint8_step_matches_float32():
    """vio_step traced with uint8 frames reproduces the float path when the
    float input equals the quantized frame."""
    import jax.numpy as jnp

    from hybvio_tpu.odometry.backend import ImuBatch
    from hybvio_tpu.odometry.vio import make_vio

    W, H = 96, 64
    p = _tiny_params(W, H)
    derived = DerivedParameters.from_parameters(p)
    cam = build_pinhole(80.0, 80.0, W / 2, H / 2, width=W, height=H)
    init_fn, vio_step = make_vio(p, derived, (cam,),
                                 max_tracks=p.tracker.maxTracks)

    rng = np.random.RandomState(3)
    u8 = [(rng.rand(H, W) * 255).astype(np.uint8) for _ in range(3)]
    f32 = [(u.astype(np.float32) / 255.0) for u in u8]

    def run(frames):
        state = init_fn(jnp.asarray(frames[0]), t0=10.0)
        S = 6
        out = None
        for k, img in enumerate(frames[1:], 1):
            t0 = 10.0 + (k - 1) * 0.1
            imu = ImuBatch(
                t=jnp.asarray(t0 + (1 + np.arange(S)) * (0.1 / S), jnp.float32),
                gyro=jnp.asarray(0.01 * np.ones((S, 3)), jnp.float32),
                acc=jnp.asarray(np.tile([0.0, 0.0, 9.819], (S, 1)), jnp.float32),
                valid=jnp.ones((S,), bool))
            state, out = vio_step(state, imu, jnp.asarray(img))
        return np.asarray(out.position), np.asarray(out.track_pixels)

    pos_u8, px_u8 = run(u8)
    pos_f32, px_f32 = run(f32)
    assert np.isfinite(pos_u8).all()
    # device normalization is x * (1/255) in f32 vs host x / 255.0 — equal to
    # float rounding; the trajectories must agree to numerical noise
    np.testing.assert_allclose(pos_u8, pos_f32, atol=1e-4)
    np.testing.assert_allclose(px_u8, px_f32, atol=0.05)


def test_api_accepts_uint8_frames():
    """VioApi end-to-end with raw uint8 frames: pooled uint8 buffers, device
    normalization, finite outputs, and viz/SLAM consumers see [0,1]."""
    from hybvio_tpu.api.vio import VioApi

    W, H = 96, 64
    p = _tiny_params(W, H)
    p.odometry.processingQueueSize = 0
    api = VioApi(p, W, H)
    outs = []
    api.on_output = outs.append
    rng = np.random.RandomState(0)
    base = (rng.rand(H, W) * 255).astype(np.uint8)
    t = 10.0
    for k in range(10):
        for i in range(5):
            api.add_gyro(t, [0.001, 0.0, 0.0])
            api.add_acc(t, [0.0, 0.0, 9.819])
            t += 0.02
        api.add_frame_mono(t, np.roll(base, k, axis=1))
    api.finish()
    assert len(outs) >= 4
    # the frame retained for viz/SLAM consumers is still the raw uint8
    assert np.asarray(api._last_images[0]).dtype == np.uint8
    pos = np.stack([o.position for o in outs])
    assert np.isfinite(pos).all()
    # the retained frame is the raw uint8; the normalizing accessor feeds
    # host consumers 0-1 floats
    gray = api._norm_gray(api._last_images[0])
    g = np.asarray(gray)
    assert g.dtype == np.float32 and 0.0 <= float(g.min()) and float(g.max()) <= 1.0


def test_to_gray_uint8_pooling():
    from hybvio_tpu.api.vio import VioApi

    W, H = 96, 64
    p = _tiny_params(W, H)
    api = VioApi(p, W, H)
    a = (np.arange(H * W, dtype=np.uint32) % 251).astype(np.uint8).reshape(H, W)
    g = api._to_gray(a)
    assert g.dtype == np.uint8 and g is not a  # pooled copy, caller may reuse
    np.testing.assert_array_equal(g, a)
    # float path unchanged
    f = api._to_gray(a.astype(np.float32) / 255.0)
    assert f.dtype == np.float32 and float(f.max()) <= 1.0
