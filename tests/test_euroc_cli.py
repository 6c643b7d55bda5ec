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
