"""Native (C++) JSONL reader equals the pure-Python behavioral spec."""
import json

import numpy as np
import pytest

nj = pytest.importorskip("hybvio_tpu.io.native_jsonl")
if not nj.native_available():
    pytest.skip("native library unavailable", allow_module_level=True)


def _write_dataset(path):
    lines = []
    rng = np.random.RandomState(0)
    t = 0.0
    for i in range(200):
        t += 0.005
        v = rng.randn(3).round(6).tolist()
        lines.append({"time": t, "sensor": {"type": "gyroscope", "values": v}})
        lines.append({"time": t + 0.001,
                      "sensor": {"type": "accelerometer",
                                 "values": rng.randn(3).round(6).tolist()}})
        if i % 10 == 0:
            lines.append({
                "time": t, "number": i // 10,
                "frames": [
                    {"cameraInd": 1, "time": t,
                     "cameraParameters": {"focalLength": 400.0,
                                          "principalPointX": 160.0,
                                          "principalPointY": 120.0}},
                    {"cameraInd": 0, "time": t,
                     "cameraParameters": {"focalLengthX": 401.0,
                                          "focalLengthY": 402.0}},
                ]})
        if i % 25 == 0:
            lines.append({"time": t, "groundTruth": {
                "position": {"x": 1.0, "y": 2.0, "z": 3.0}}})
    # oddballs: unknown sensor type, empty frames, unknown keys, blank line
    lines.append({"time": t, "sensor": {"type": "magnetometer",
                                        "values": [1, 2, 3]}})
    lines.append({"time": t, "frames": []})
    lines.append({"somethingElse": 42})
    with open(path, "w") as f:
        for l in lines:
            f.write(json.dumps(l) + "\n")
        f.write("\n")


def test_native_reader_matches_python(tmp_path):
    from hybvio_tpu.io import jsonl as jio

    path = str(tmp_path / "data.jsonl")
    _write_dataset(path)

    native_events = list(nj.iter_events(path))

    # force the pure-Python path by monkeypatching availability
    import hybvio_tpu.io.native_jsonl as mod
    orig = mod.iter_events
    mod.iter_events = lambda p: None
    try:
        py_events = list(jio.read_jsonl_events(path))
    finally:
        mod.iter_events = orig

    assert len(native_events) == len(py_events)
    for a, b in zip(native_events, py_events):
        assert a.kind == b.kind
        assert a.t == pytest.approx(b.t)
        if a.values is not None or b.values is not None:
            np.testing.assert_allclose(a.values, b.values)
        if b.frames is not None:
            assert a.frames is not None and len(a.frames) == len(b.frames)
            for fa, fb in zip(a.frames, b.frames):
                assert fa.camera_ind == fb.camera_ind
                assert fa.t == pytest.approx(fb.t)
                assert fa.focal_length_x == pytest.approx(fb.focal_length_x)
                assert fa.focal_length_y == pytest.approx(fb.focal_length_y)
                assert fa.principal_point_x == pytest.approx(fb.principal_point_x)
                assert fa.principal_point_y == pytest.approx(fb.principal_point_y)
                assert fa.number == fb.number
            assert a.frames_index == b.frames_index
        if b.raw is not None:
            assert a.raw == b.raw


def test_dispatch_used_by_default(tmp_path):
    """read_jsonl_events routes through the native parser when built."""
    from hybvio_tpu.io import jsonl as jio

    path = str(tmp_path / "data.jsonl")
    _write_dataset(path)
    events = list(jio.read_jsonl_events(path))
    gyro = [e for e in events if e.kind == jio.GYROSCOPE]
    frames = [e for e in events if e.kind == jio.FRAME]
    echoes = [e for e in events if e.kind == jio.ECHO]
    assert len(gyro) == 200 and len(frames) == 20 and len(echoes) == 8
    # frames sorted by cameraInd with focalLength fallback applied
    f0 = frames[0].frames
    assert [f.camera_ind for f in f0] == [0, 1]
    assert f0[1].focal_length_x == pytest.approx(400.0)
