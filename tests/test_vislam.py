"""Full VISLAM (-useSlam equivalent): VIO + async SLAM backend on the
synthetic dataset; SLAM coupling must keep outputs sane and produce a map."""
import os
import sys

import numpy as np
import pytest

from hybvio_tpu.eval.ate import ate_rmse
from hybvio_tpu.io import jsonl as jio


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_synthetic_dataset import make_dataset

    out = str(tmp_path_factory.mktemp("synth_slam"))
    make_dataset(out, duration=5.0)
    return out


@pytest.mark.slow
def test_vislam_end_to_end(dataset):
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
    p.slam.useSlam = True
    p.slam.keyframeCandidateInterval = 4
    p.slam.slamThread = True
    p.slam.keyframeDecisionMinIntervalSeconds = 0.1

    api = VioApi(p, 320, 240)
    outputs = []
    api.on_output = outputs.append

    frames = open_frame_source(dataset)
    n = 0
    for ev in jio.read_jsonl_events(os.path.join(dataset, "data.jsonl")):
        if ev.kind == jio.GYROSCOPE:
            api.add_gyro(ev.t, ev.values)
        elif ev.kind == jio.ACCELEROMETER:
            api.add_acc(ev.t, ev.values)
        elif ev.kind == jio.FRAME:
            api.add_frame_mono(ev.t, frames.frame(ev.frames_index))
            n += 1
    api.finish()

    assert len(outputs) > 30
    # SLAM session created keyframes and map points
    assert len(api.slam.slam.kf_order) >= 3
    assert len(api.slam.slam._cloud()) > 5

    est_t = np.array([o.t for o in outputs])
    est = np.stack([o.position for o in outputs])
    assert np.isfinite(est).all()
    gt_hist = jio.get_pose_histories(os.path.join(dataset, "data.jsonl"))["groundTruth"]
    gt = np.stack([gt_hist[np.argmin(np.abs(gt_hist[:, 0] - t)), 1:4] for t in est_t])
    ate = ate_rmse(est, gt - gt_hist[0, 1:4])
    assert ate < 0.12, ate

    # SLAM-side map points should appear in the merged output cloud (neg. ids).
    # The SLAM worker is async: under heavy CPU contention the results for
    # the last keyframes may only be consumed during finish(), so fall back
    # to a post-finish conversion of the last frame — the exact same merge
    # path (_convert_output), exercised deterministically.
    last_clouds = [o.point_cloud for o in outputs[-5:] if len(o.point_cloud)]
    if not any((c[:, 0] < 0).any() for c in last_clouds):
        vo = api._convert_output(api.last_frame_output)
        assert len(vo.point_cloud) and (vo.point_cloud[:, 0] < 0).any()
