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


def test_output_buffer_in_api():
    """targetOutputDelaySeconds routes outputs through the smoothing buffer
    (reference: api::OutputBuffer); finish() drains held outputs."""
    from hybvio_tpu.api.vio import VioApi
    from hybvio_tpu.config import Parameters

    p = Parameters()
    p.odometry.targetOutputDelaySeconds = 60.0  # hold everything until finish
    # the frames below are pure noise, so the SFT estimate is junk; a junk
    # shift fed back into sample sync can push the last frame's effective
    # timestamp past the end of the sample stream (this test is about the
    # output buffer, not time-shift estimation)
    p.odometry.estimateImuCameraTimeShift = False
    p.tracker.maxTracks = 8
    p.odometry.cameraTrailLength = 4
    p.tracker.focalLength = 80.0
    p.tracker.principalPointX = 48.0
    p.tracker.principalPointY = 32.0
    p.tracker.pyrLKWindowSize = 9
    p.tracker.pyrLKMaxLevel = 1
    api = VioApi(p, 96, 64)
    outs = []
    api.on_output = outs.append
    rng = np.random.RandomState(0)
    t = 0.0
    for k in range(40):
        t += 0.005
        api.add_gyro(t, (0.01, 0.0, 0.0))
        api.add_acc(t, (0.0, 0.0, 9.81))
        if k % 10 == 5:
            api.add_frame_mono(t, rng.rand(64, 96).astype(np.float32))
    assert len(outs) == 0  # everything held by the 60 s delay
    # sync point: retire pipelined in-flight outputs so the assertion sees
    # what the OUTPUT BUFFER holds (the subject here), not pipeline depth
    api.wait_idle()
    assert api.output_buffer is not None and len(api.output_buffer.buf) >= 2
    api.finish()
    assert len(outs) >= 2  # drained
