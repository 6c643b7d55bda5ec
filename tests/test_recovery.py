"""Fault injection: blackout frames through the full VioApi must trip the
good-frame hysteresis into LOST_TRACKING and auto-reset back into TRACKING
(reference: backend.cpp:806-819 good-frame window + control.cpp:124-149
reset-keeping-pose; SURVEY §5 failure detection/recovery)."""
import os
import sys

import numpy as np
import pytest

from hybvio_tpu.io import jsonl as jio


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_synthetic_dataset import make_dataset

    out = str(tmp_path_factory.mktemp("synth_recovery"))
    make_dataset(out, duration=8.0)
    return out


@pytest.mark.slow
def test_blackout_recovery(dataset):
    from hybvio_tpu.api.vio import VioApi
    from hybvio_tpu.config import Parameters
    from hybvio_tpu.io.video import open_frame_source

    p = Parameters()
    jio.set_parameters_from_data(p, os.path.join(dataset, "data.jsonl"))
    p.tracker.focalLength = 260.0
    p.tracker.principalPointX = 160.0
    p.tracker.principalPointY = 120.0
    p.tracker.maxTracks = 48
    p.odometry.cameraTrailLength = 8
    p.tracker.pyrLKWindowSize = 15
    p.tracker.pyrLKMaxLevel = 2
    p.tracker.gfttMinDistance = 25.0
    p.odometry.visualR = 0.3
    # make the hysteresis react within the blackout length
    p.odometry.goodFramesTimeWindowSeconds = 1.0

    api = VioApi(p, 320, 240)
    outputs = []
    api.on_output = outputs.append
    frames = open_frame_source(dataset)

    n = 0
    statuses = []
    black = np.zeros((240, 320), np.float32)
    for ev in jio.read_jsonl_events(os.path.join(dataset, "data.jsonl")):
        if ev.kind == jio.GYROSCOPE:
            api.add_gyro(ev.t, ev.values)
        elif ev.kind == jio.ACCELEROMETER:
            api.add_acc(ev.t, ev.values)
        elif ev.kind == jio.FRAME:
            num = ev.frames_index if ev.frames_index >= 0 else n
            img = frames.frame(num)
            if 35 <= n < 55:  # 2 s blackout: no texture, no tracks
                img = black
            api.add_frame_mono(ev.t, img)
            statuses.append(api._status)
            n += 1
    api.finish()

    statuses = np.array(statuses)
    # 1) tracking was established before the blackout
    assert (statuses[:35] == 1).any(), "never reached TRACKING before fault"
    # 2) the fault was detected (LOST_TRACKING=2 or re-INIT=0 during/after)
    assert (statuses[40:70] != 1).any(), "blackout never detected"
    # 3) recovery: TRACKING again by the end
    assert (statuses[-8:] == 1).any(), f"no recovery, tail={statuses[-12:]}"
    # 4) outputs kept flowing and stayed finite through the fault
    est = np.stack([o.position for o in outputs])
    # resets consume a frame to re-initialize (reference Control behaves the
    # same: the session rebuild swallows the triggering frame)
    assert len(outputs) >= n - 6
    assert np.isfinite(est).all()
    # 5) post-recovery the filter tracks motion again: the trajectory moves
    # (not frozen) over the final second
    tail = est[-10:]
    assert np.linalg.norm(tail[-1] - tail[0]) > 1e-3
