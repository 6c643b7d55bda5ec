"""Deterministic replay: the same recorded dataset run twice must produce
identical trajectories (the reference's reproducibility contract: fixed RNG
seeds + record/replay; SURVEY.md section 5 checkpoint/resume)."""
import os
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_replay_determinism(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_synthetic_dataset import make_dataset

    from hybvio_tpu.api.vio import VioApi
    from hybvio_tpu.config import Parameters
    from hybvio_tpu.io import jsonl as jio
    from hybvio_tpu.io.video import open_frame_source

    d = str(tmp_path / "ds")
    make_dataset(d, duration=3.0)

    def run():
        p = Parameters()
        jio.set_parameters_from_data(p, d + "/data.jsonl")
        p.tracker.focalLength = 260.0
        p.tracker.principalPointX = 160.0
        p.tracker.principalPointY = 120.0
        p.tracker.maxTracks = 32
        p.odometry.cameraTrailLength = 6
        p.tracker.pyrLKWindowSize = 13
        p.tracker.pyrLKMaxLevel = 2
        p.tracker.gfttMinDistance = 30.0
        p.odometry.visualR = 0.3
        api = VioApi(p, 320, 240)
        outs = []
        api.on_output = outs.append
        fr = open_frame_source(d)
        for ev in jio.read_jsonl_events(d + "/data.jsonl"):
            if ev.kind == jio.GYROSCOPE:
                api.add_gyro(ev.t, ev.values)
            elif ev.kind == jio.ACCELEROMETER:
                api.add_acc(ev.t, ev.values)
            elif ev.kind == jio.FRAME:
                api.add_frame_mono(ev.t, fr.frame(ev.frames_index))
        return np.stack([o.position for o in outs])

    a = run()
    b = run()
    np.testing.assert_array_equal(a, b)


def test_image_utils():
    import jax.numpy as jnp

    from hybvio_tpu.frontend.image_utils import match_intensities, rotate, rotate_cw90

    img = jnp.arange(6.0).reshape(2, 3) / 6.0
    r = rotate_cw90(img)
    assert r.shape == (3, 2)
    np.testing.assert_allclose(np.asarray(rotate(img, 4)), np.asarray(img))
    a = jnp.ones((8, 8)) * 0.8
    b = jnp.ones((8, 8)) * 0.2 + jnp.eye(8) * 0.1
    m = match_intensities(a, b)
    assert abs(float(jnp.mean(m)) - 0.8) < 0.05
