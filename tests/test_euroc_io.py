"""EuRoC mav0-layout reader on a fabricated fixture."""
import json
import os

import numpy as np
import pytest

from hybvio_tpu.io.euroc import (read_camera_calib, read_euroc_calibration,
                                 read_euroc_events)
from hybvio_tpu.io.jsonl import ACCELEROMETER, ECHO, FRAME, GYROSCOPE
from hybvio_tpu.config.loader import load_parameters

SENSOR_YAML = """%YAML:1.0
# fabricated cam{ci} calibration (EuRoC sensor.yaml format)
sensor_type: camera
T_BS:
  rows: 4
  cols: 4
  data: [0.0, 0.0, 1.0, 0.1,
        -1.0, 0.0, 0.0, 0.02,
         0.0, -1.0, 0.0, -0.03,
         0.0, 0.0, 0.0, 1.0]
rate_hz: 20
resolution: [752, 480]
camera_model: pinhole
intrinsics: [458.654, 457.296, 367.215, 248.375]
distortion_model: radial-tangential
distortion_coefficients: [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05]
"""


@pytest.fixture
def mav_dir(tmp_path):
    root = tmp_path / "mav0"
    for ci in range(2):
        cam = root / f"cam{ci}"
        (cam / "data").mkdir(parents=True)
        (cam / "sensor.yaml").write_text(SENSOR_YAML)
        rows = ["#timestamp [ns],filename"]
        for k in range(3):
            ts = 1403636579763555584 + k * 50_000_000
            rows.append(f"{ts},{ts}.png")
        (cam / "data.csv").write_text("\n".join(rows) + "\n")
    imu = root / "imu0"
    imu.mkdir()
    rows = ["#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z"]
    for k in range(12):
        ts = 1403636579758555584 + k * 5_000_000
        rows.append(f"{ts},0.01,0.02,-0.01,0.1,-0.2,9.8")
    (imu / "data.csv").write_text("\n".join(rows) + "\n")
    gt = root / "state_groundtruth_estimate0"
    gt.mkdir()
    (gt / "data.csv").write_text(
        "#timestamp,...\n1403636579763555584,1.0,2.0,3.0,1.0,0.0,0.0,0.0\n")
    return str(root)


def test_calib_parse(mav_dir):
    c = read_camera_calib(os.path.join(mav_dir, "cam0"))
    assert (c.width, c.height) == (752, 480)
    assert abs(c.focal_length_x - 458.654) < 1e-9
    assert abs(c.principal_point_y - 248.375) < 1e-9
    assert c.model == "pinhole"
    assert len(c.distortion) == 4
    # T_BS inverse: verify imuToCamera @ T_BS == I
    T_BS = np.array([[0, 0, 1, 0.1], [-1, 0, 0, 0.02],
                     [0, -1, 0, -0.03], [0, 0, 0, 1.0]])
    np.testing.assert_allclose(c.imu_to_camera @ T_BS, np.eye(4), atol=1e-12)


def test_event_stream(mav_dir):
    events = list(read_euroc_events(mav_dir))
    kinds = [e.kind for e in events]
    assert kinds.count(GYROSCOPE) == 12
    assert kinds.count(ACCELEROMETER) == 12
    assert kinds.count(FRAME) == 3
    assert kinds.count(ECHO) == 1
    # time-ordered
    ts = [e.t for e in events]
    assert ts == sorted(ts)
    # frames carry both camera paths
    fr = [e for e in events if e.kind == FRAME][0]
    assert len(fr.frames) == 2
    assert len(fr.raw["paths"]) == 2
    assert fr.raw["paths"][0].endswith(".png")
    assert "cam0" in fr.raw["paths"][0] and "cam1" in fr.raw["paths"][1]
    # IMU precedes the simultaneous frame at equal timestamps
    gt = [e for e in events if e.kind == ECHO][0]
    assert gt.raw["groundTruth"]["position"]["x"] == 1.0


def test_calibration_feeds_loader(mav_dir):
    cams = read_euroc_calibration(mav_dir)
    assert len(cams) == 2
    params = load_parameters(
        calibration_json=json.dumps({"cameras": cams}))
    assert abs(params.tracker.focalLengthX - 458.654) < 1e-9
    assert abs(params.tracker.secondPrincipalPointX - 367.215) < 1e-9
    # imuToCameraMatrix stored column-major flat (reference convention)
    m = np.asarray(params.odometry.imuToCameraMatrix).reshape(4, 4).T
    T_BS = np.array([[0, 0, 1, 0.1], [-1, 0, 0, 0.02],
                     [0, -1, 0, -0.03], [0, 0, 0, 1.0]])
    np.testing.assert_allclose(m, np.linalg.inv(T_BS), atol=1e-12)
    assert not params.tracker.fisheyeCamera
