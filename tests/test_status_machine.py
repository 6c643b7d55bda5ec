"""Status latch + auto-reset table (reference: control.cpp:117-150) and the
recordingOnly mode (reference: DebugParameters::recordingOnly,
internal.hpp:113-115): one unit test per transition row, driven through a
pipeline-free VioApi (recording_only builds no control pipeline, so these
tests exercise exactly the host-side state machine)."""
import dataclasses

import numpy as np
import pytest

from hybvio_tpu.api.vio import VioApi
from hybvio_tpu.config import Parameters


@dataclasses.dataclass
class _Out:
    tracking_status: int
    t: float


def _api(**odo):
    p = Parameters()
    for k, v in odo.items():
        setattr(p.odometry, k, v)
    api = VioApi(p, 64, 48, recording_only=True)
    calls = []
    api.reset = lambda keep_pose=False, t=None: calls.append((keep_pose, t))
    return api, calls


RESET_T = 3.0  # default resetAfterTrackingFailsToInitialize


def test_init_timer_expired_resets_fresh():
    api, calls = _api(resetUntilInitSucceeds=True)
    api._handle_status_and_reset(_Out(0, RESET_T + 1.0))
    assert calls == [(False, RESET_T + 1.0)]
    assert api._status == 0


def test_init_timer_not_expired_no_reset():
    api, calls = _api(resetUntilInitSucceeds=True)
    api._handle_status_and_reset(_Out(0, RESET_T - 1.0))
    assert calls == []


def test_init_without_flag_no_reset():
    api, calls = _api(resetUntilInitSucceeds=False)
    api._handle_status_and_reset(_Out(0, RESET_T + 1.0))
    assert calls == []


def test_lost_with_reset_on_failed_keeps_pose():
    api, calls = _api(resetOnFailedTracking=True)
    api._handle_status_and_reset(_Out(2, 1.0))
    assert calls == [(True, 1.0)]
    assert api._status == 2


def test_lost_without_flag_only_latches():
    api, calls = _api(resetOnFailedTracking=False)
    api._handle_status_and_reset(_Out(2, 1.0))
    assert calls == []
    assert api._status == 2


def test_status_never_demotes_to_init():
    api, calls = _api()
    api._handle_status_and_reset(_Out(1, 1.0))
    assert api._status == 1
    api._handle_status_and_reset(_Out(0, 2.0))  # fresh session reports INIT
    assert api._status == 1  # latched
    assert calls == []  # timer not expired -> no reset


def test_tracking_then_session_init_timer_expired_resets_keep_pose():
    api, calls = _api()
    api._handle_status_and_reset(_Out(1, 1.0))
    api._handle_status_and_reset(_Out(0, RESET_T + 1.5))
    assert calls == [(True, RESET_T + 1.5)]
    assert api._status == 1


def test_lost_priority_over_timed_reinit():
    """Row order: LOST+resetOnFailedTracking wins over the timed re-init."""
    api, calls = _api(resetOnFailedTracking=True)
    api._handle_status_and_reset(_Out(2, RESET_T + 2.0))
    assert calls == [(True, RESET_T + 2.0)]


# ------------------------------------------------------- recordingOnly mode

def test_recording_only_records_without_running(tmp_path):
    from hybvio_tpu.io.jsonl import Recorder

    p = Parameters()
    api = VioApi(p, 64, 48, recording_only=True)
    assert api._vio_step is None  # no control pipeline built
    api.recorder = Recorder(str(tmp_path), save_frames=True)
    outputs = []
    api.on_output = outputs.append
    rng = np.random.RandomState(0)
    img = rng.rand(48, 64).astype(np.float32)
    for k in range(10):
        t = 0.01 * k
        api.add_gyro(t, [0.0, 0.0, 0.1])
        api.add_acc(t, [0.0, 0.0, 9.81])
        if k % 5 == 0:
            api.add_frame_mono(t, img)
    api.finish()

    assert outputs == []  # algorithm never ran
    assert api._state is None
    assert api.sample_sync.poll_synced_sample() is None  # nothing ingested
    lines = open(tmp_path / "data.jsonl").read().splitlines()
    # 10 gyro + 10 acc + 2 frames
    assert len(lines) == 22
    import json

    kinds = [("sensor" in json.loads(l)) for l in lines]
    assert sum(kinds) == 20


def test_recording_only_skips_slam():
    p = Parameters()
    p.slam.useSlam = True
    api = VioApi(p, 64, 48, recording_only=True)
    assert api.slam is None
