"""Native (C++) sample synchronizer: same behavior as the Python reference
implementation, verified by equivalence on randomized streams."""
import numpy as np
import pytest

from hybvio_tpu.config import Parameters
from hybvio_tpu.odometry.sample_sync import SampleSync

native = pytest.importorskip("hybvio_tpu.io.native_sync")
if not native.native_available():
    pytest.skip("native library unavailable", allow_module_level=True)


def make_pair():
    p = Parameters()
    p.odometry.sampleSyncLag = 25
    return SampleSync(p.odometry), native.NativeSampleSync(p.odometry)


def test_equivalence_on_random_stream():
    py, nat = make_pair()
    rng = np.random.RandomState(0)
    t = 5.0
    i = 0
    out_py, out_nat = [], []
    while t < 8.0:
        tl = t + rng.randn() * 0.002
        v = rng.randn(3)
        py.add_sample_leader(tl, tuple(v))
        nat.add_sample_leader(tl, tuple(v))
        ta = t + 0.003 + rng.randn() * 0.002
        a = rng.randn(3)
        py.add_sample_follower(ta, tuple(a))
        nat.add_sample_follower(ta, tuple(a))
        if i % 10 == 3:
            py.add_frame(t + 0.001)
            nat.add_frame(t + 0.001)
        while True:
            sp = py.poll_synced_sample()
            sn = nat.poll_synced_sample()
            assert (sp is None) == (sn is None)
            if sp is None:
                break
            assert abs(sp.t - sn.t) < 1e-12
            assert abs(sp.tF - sn.tF) < 1e-12
            np.testing.assert_allclose(sp.l, sn.l)
            np.testing.assert_allclose(sp.f, sn.f)
            assert (sp.frame is None) == (sn.frame is None)
            if sp.frame is not None:
                assert sp.frame.num == sn.frame.num
                assert abs(sp.frame.t - sn.frame.t) < 1e-12
            out_py.append(sp)
        t += 0.01
        i += 1
    assert len(out_py) > 100


def test_frame_payload_round_trip():
    _, nat = make_pair()
    img = np.zeros((4, 4), np.float32) + 0.5
    for i in range(60):
        t = 1.0 + i * 0.01
        nat.add_sample_leader(t, (0, 0, 0))
        nat.add_sample_follower(t, (0, 0, 9.8))
    nat.add_frame(1.3, first_image=img)
    nat.add_frame(1.4)  # sampleSyncFrameCount=2 frames needed before output
    got = None
    while True:
        s = nat.poll_synced_sample()
        if s is None:
            break
        if s.frame is not None and s.frame.first_image is not None:
            got = s.frame
    assert got is not None
    np.testing.assert_allclose(got.first_image, img)
