"""On-device blob renderer (io/synthetic_jax.py) parity with the numpy
reference renderer (io/synthetic.py) — the bench renders its frames on
device, so the two must produce the same world."""
import numpy as np

from hybvio_tpu.io.synthetic import (
    SYNTH_IMU_TO_CAMERA, generate_sequence, render_view, render_view_fisheye,
)
from hybvio_tpu.io.synthetic_jax import make_blob_renderer

KB4 = (0.0035, 0.0007, -0.002, 0.0002)


def _seq():
    return generate_sequence(duration=3.0, imu_rate=100.0, frame_rate=10.0,
                             n_landmarks=200, seed=3)


def test_pinhole_parity():
    W, H, FX = 188, 120, 114.5
    seq = _seq()
    render = make_blob_renderer([SYNTH_IMU_TO_CAMERA], FX, FX, W / 2, H / 2,
                                W, H)
    for fi in (0, 7, 19):
        k = seq.frame_sample_idx[fi]
        ref = render_view(seq.landmarks, seq.pos[k], seq.quat[k],
                          SYNTH_IMU_TO_CAMERA, FX, FX, W / 2, H / 2, W, H,
                          blob_sigma=1.4)
        dev = np.asarray(render(seq.landmarks, seq.pos[k], seq.quat[k])[0])
        assert dev.shape == ref.shape
        # float32 vs float64 transcendental + border-visibility rounding:
        # the images must agree to well below the probes' pixel noise (0.01)
        assert np.mean(np.abs(dev - ref)) < 2e-3
        assert np.percentile(np.abs(dev - ref), 99.9) < 0.05


def test_stereo_two_cameras():
    W, H, FX = 188, 120, 114.5
    seq = _seq()
    second = np.asarray(SYNTH_IMU_TO_CAMERA).copy()
    second[0, 3] = -0.11
    render = make_blob_renderer([SYNTH_IMU_TO_CAMERA, second], FX, FX,
                                W / 2, H / 2, W, H)
    k = seq.frame_sample_idx[5]
    out = np.asarray(render(seq.landmarks, seq.pos[k], seq.quat[k]))
    assert out.shape == (2, H, W)
    refL = render_view(seq.landmarks, seq.pos[k], seq.quat[k],
                       SYNTH_IMU_TO_CAMERA, FX, FX, W / 2, H / 2, W, H,
                       blob_sigma=1.4)
    refR = render_view(seq.landmarks, seq.pos[k], seq.quat[k], second,
                       FX, FX, W / 2, H / 2, W, H, blob_sigma=1.4)
    assert np.mean(np.abs(out[0] - refL)) < 2e-3
    assert np.mean(np.abs(out[1] - refR)) < 2e-3
    # the stereo pair must differ (baseline parallax), i.e. not two copies
    assert np.mean(np.abs(refL - refR)) > 1e-4


def test_fisheye_parity():
    W = H = 128
    FX = 47.5
    seq = _seq()
    render = make_blob_renderer([SYNTH_IMU_TO_CAMERA], FX, FX, W / 2, H / 2,
                                W, H, fisheye_coeffs=KB4, max_fov_deg=150.0)
    k = seq.frame_sample_idx[9]
    ref = render_view_fisheye(seq.landmarks, seq.pos[k], seq.quat[k],
                              SYNTH_IMU_TO_CAMERA, FX, FX, W / 2, H / 2,
                              W, H, KB4, max_fov_deg=150.0, blob_sigma=1.4)
    dev = np.asarray(render(seq.landmarks, seq.pos[k], seq.quat[k])[0])
    assert np.mean(np.abs(dev - ref)) < 2e-3
    assert np.percentile(np.abs(dev - ref), 99.9) < 0.05


def test_vmap_lanes():
    import jax

    W, H, FX = 94, 60, 57.0
    seqs = [generate_sequence(duration=1.0, imu_rate=100.0, frame_rate=10.0,
                              n_landmarks=200, seed=s) for s in (1, 2, 3)]
    render = make_blob_renderer([SYNTH_IMU_TO_CAMERA], FX, FX, W / 2, H / 2,
                                W, H)
    batched = jax.vmap(render)
    lms = np.stack([s.landmarks for s in seqs])
    k = [s.frame_sample_idx[4] for s in seqs]
    pos = np.stack([s.pos[k[i]] for i, s in enumerate(seqs)])
    quat = np.stack([s.quat[k[i]] for i, s in enumerate(seqs)])
    out = np.asarray(batched(lms, pos, quat))
    assert out.shape == (3, 1, H, W)
    for i, s in enumerate(seqs):
        ref = render_view(s.landmarks, s.pos[k[i]], s.quat[k[i]],
                          SYNTH_IMU_TO_CAMERA, FX, FX, W / 2, H / 2, W, H,
                          blob_sigma=1.4)
        assert np.mean(np.abs(out[i, 0] - ref)) < 3e-3
