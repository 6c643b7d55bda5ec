"""Utility tests: timers, GPS converter, output buffer, allocator, stats."""
import numpy as np

from hybvio_tpu.utils.timer import TimeStats
from hybvio_tpu.utils.gps import GpsToLocalConverter
from hybvio_tpu.utils.allocator import Allocator
from hybvio_tpu.api.output_buffer import OutputBuffer
from hybvio_tpu.odometry.stats import VisualUpdateStats


def test_time_stats():
    ts = TimeStats()
    for _ in range(4):
        ts.start_frame()
        with ts.scope("predict"):
            pass
        with ts.scope("update"):
            pass
    timings = ts.per_frame_timings()
    assert set(timings) == {"predict", "update"}
    assert ts.counts["predict"] == 4
    assert "per-frame timings over 4 frames" in ts.report()


def test_gps_to_local():
    g = GpsToLocalConverter()
    e0, n0, u0 = g.convert(60.0, 24.0, 10.0)
    assert (e0, n0, u0) == (0.0, 0.0, 0.0)
    # ~1.11 km per 0.01 deg latitude
    e, n, u = g.convert(60.01, 24.0, 12.0)
    assert abs(n - 1113) < 15 and abs(e) < 1e-6 and u == 2.0
    # longitude scale ~ cos(60 deg) = half
    e, n, u = g.convert(60.0, 24.01, 10.0)
    assert abs(e - 557) < 15


def test_allocator_reuse():
    made = []
    a = Allocator(lambda: made.append(1) or np.zeros(3), max_size=20)
    x = a.next()
    n1 = len(made)
    x = None  # release
    y = a.next()
    assert len(made) == n1  # reused, no growth


def test_output_buffer_passthrough():
    class Out:
        def __init__(self, t):
            self.t = t

    ob = OutputBuffer(0.0)
    ob.add_processed_frame(Out(1.0))
    ob.add_processed_frame(Out(1.1))
    assert ob.poll_output().t == 1.0
    assert ob.poll_output().t == 1.1
    assert ob.poll_output() is None


def test_visual_update_stats():
    s = VisualUpdateStats(enabled=True)
    s.count_from_output(np.array([1, 1, 2, 4, 0]))
    line = s.finish_frame()
    assert "used=3" in line and "outlier_chi2=1" in line
    assert "3" in s.report()
