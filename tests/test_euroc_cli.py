"""End-to-end: synthetic sequence written in the EuRoC ASL (mav0) layout,
consumed directly by the CLI (no JSONL conversion), trajectory vs recorded
ground truth."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from hybvio_tpu.eval.ate import ate_rmse


@pytest.fixture(scope="module")
def euroc_dataset(tmp_path_factory):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_synthetic_dataset import make_euroc_dataset

    out = str(tmp_path_factory.mktemp("euroc"))
    make_euroc_dataset(out, duration=4.0)
    return out


@pytest.mark.slow
def test_cli_on_euroc_layout(euroc_dataset, tmp_path):
    out_path = str(tmp_path / "out.jsonl")
    env = dict(os.environ)
    # HYBVIO_PLATFORM (not JAX_PLATFORMS): the ambient sitecustomize re-forces
    # the remote-TPU platform via jax.config, which env vars don't survive;
    # the CLI applies this one through jax.config itself
    env["HYBVIO_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "hybvio_tpu.cli.main",
         f"-i={euroc_dataset}", f"-o={out_path}", "-timer",
         "-odometry.visualR=0.3", "-tracker.maxTracks=48",
         "-odometry.cameraTrailLength=8", "-tracker.gfttMinDistance=25",
         "-tracker.pyrLKMaxLevel=2"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.join(os.path.dirname(__file__), ".."), env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "per-frame timings" in r.stderr  # -timer report printed

    est = []
    with open(out_path) as f:
        for line in f:
            d = json.loads(line)
            est.append([d["time"], d["position"]["x"], d["position"]["y"],
                        d["position"]["z"]])
    est = np.asarray(est)
    assert len(est) >= 20

    gt_csv = os.path.join(euroc_dataset, "state_groundtruth_estimate0",
                          "data.csv")
    gt = []
    with open(gt_csv) as f:
        for line in f:
            if line.startswith("#"):
                continue
            v = line.strip().split(",")
            gt.append([int(v[0]) * 1e-9, float(v[1]), float(v[2]), float(v[3])])
    gt = np.asarray(gt)
    # align by time
    gt_at = np.stack([
        np.interp(est[:, 0], gt[:, 0], gt[:, 1 + i]) for i in range(3)], axis=1)
    gt_at -= gt_at[0]
    ate = ate_rmse(est[:, 1:4], gt_at)
    assert np.isfinite(est).all()
    assert ate < 0.12, ate


@pytest.mark.slow
def test_stereo_cli_timer_reports_stage_labels(tmp_path):
    """-timer on a stereo run prints the reference-style per-label table
    (reference: main.cpp:1008-1016 — KF predict, optical flow, keypoint
    detection, each RANSAC variant): >= 7 stage labels, mixing the real
    per-frame scopes with the attributed sub-program timings."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_synthetic_dataset import make_euroc_dataset

    data = str(tmp_path / "euroc_stereo")
    make_euroc_dataset(data, duration=2.5, stereo=True)
    out_path = str(tmp_path / "out.jsonl")
    env = dict(os.environ)
    env["HYBVIO_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "hybvio_tpu.cli.main",
         f"-i={data}", f"-o={out_path}", "-timer", "-useStereo",
         "-tracker.maxTracks=32", "-odometry.cameraTrailLength=6",
         "-tracker.pyrLKMaxLevel=2"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.join(os.path.dirname(__file__), ".."), env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "per-frame timings" in r.stderr
    report = r.stderr[r.stderr.index("per-frame timings"):]
    labels = [l.split("ms", 1)[1].strip() for l in report.splitlines()
              if " ms  " in l]
    assert len(labels) >= 7, labels
    text = "\n".join(labels)
    for needle in ("KF predict", "optical flow", "keypoint detection",
                   "ransac2", "stereo", "pyramids", "visual update"):
        assert needle in text, (needle, labels)
    # sub-stage labels must be PER-FRAME accumulations from the actual run
    # (one sample per frame, reference util/timer.hpp:15-55), not a
    # last-frame-only re-timing: the report tags real accumulations with
    # their sample count (xN), attributed one-offs with [attributed]
    import re
    for sub in ("optical flow", "keypoint detection", "ransac2"):
        line = next(l for l in report.splitlines() if sub in l)
        m = re.search(r"\(x(\d+)\)", line)
        assert m, f"{sub} not per-frame accumulated: {line}"
        assert int(m.group(1)) >= 10, f"{sub} too few samples: {line}"


@pytest.mark.slow
def test_cli_use_slam_end_to_end(tmp_path):
    """The reference's headline invocation (`./main -i=... -useSlam`,
    README.md:95-104) through our CLI: full VioApi + async SLAM worker +
    -timer (which must print the SLAM per-keyframe stage table), trajectory
    scored against the dataset's ground truth."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_synthetic_dataset import make_dataset

    data = str(tmp_path / "ds")
    make_dataset(data, duration=6.0)
    out_path = str(tmp_path / "out.jsonl")
    env = dict(os.environ)
    env["HYBVIO_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "hybvio_tpu.cli.main",
         f"-i={data}", f"-o={out_path}", "-useSlam", "-timer",
         "-slam.keyframeCandidateInterval=4"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.join(os.path.dirname(__file__), ".."), env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    # SLAM worker ran and reported its per-keyframe stage table
    assert "SLAM worker (per keyframe)" in r.stderr, r.stderr[-2000:]

    est, est_t = [], []
    with open(out_path) as f:
        for line in f:
            d = json.loads(line)
            est.append([d["position"]["x"], d["position"]["y"],
                        d["position"]["z"]])
            est_t.append(d["time"])
    est = np.asarray(est)
    assert len(est) >= 40 and np.isfinite(est).all()

    gt, gt_t = [], []
    with open(os.path.join(data, "data.jsonl")) as f:
        for line in f:
            d = json.loads(line)
            if "groundTruth" in d:
                p = d["groundTruth"]["position"]
                gt.append([p["x"], p["y"], p["z"]])
                gt_t.append(d["time"])
    gt = np.asarray(gt)
    gt_at = np.stack([np.interp(est_t, gt_t, gt[:, i]) for i in range(3)],
                     axis=1)
    gt_at -= gt_at[0]
    ate = ate_rmse(est, gt_at)
    assert ate < 0.15, ate
