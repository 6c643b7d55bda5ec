"""Multi-sequence benchmark runner on two small synthetic datasets."""
import json
import os
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_run_benchmark_two_sequences(tmp_path, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_synthetic_dataset import make_dataset
    import run_benchmark

    d1 = str(tmp_path / "seq1")
    d2 = str(tmp_path / "seq2")
    make_dataset(d1, duration=5.0, seed=0)
    make_dataset(d2, duration=5.0, seed=1)

    rc = run_benchmark.main([
        d1, d2, "-odometry.visualR=0.3", "-tracker.maxTracks=48",
        "-odometry.cameraTrailLength=8", "-tracker.gfttMinDistance=25",
        "-tracker.pyrLKMaxLevel=2",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert summary["completed"] == 2
    assert summary["total"] == 2
    assert summary["ate_rmse_m_median"] is not None
    assert summary["ate_rmse_m_median"] < 0.12, summary  # 5 s sequences
    for r in summary["sequences"]:
        assert r["frames"] >= 30
