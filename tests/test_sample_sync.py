"""SampleSync tests, porting the reference cases (reference: test/sample_sync.cpp):
no-choke, frame pairing order + leaderTimeDiff, out-of-order/late-start streams."""
from hybvio_tpu.config import Parameters
from hybvio_tpu.odometry.sample_sync import SampleSync


def make_ss():
    p = Parameters()
    p.odometry.sampleSyncLag = 25
    p.odometry.visualUpdateEnabled = True
    return SampleSync(p.odometry)


def test_no_choke():
    ss = make_ss()
    t = 5.0
    while t < 8.0:
        ss.add_sample_leader(t, (t, t, t))
        ss.add_sample_follower(t, (t, t, t))
        t += 0.01


def test_frame_pairing():
    ss = make_ss()
    dt = 0.01
    camlag = 0.002
    out_nums = []
    t = 1.0
    i = 0
    while t < 5.0:
        ss.add_sample_leader(t, (t, t, t))
        ss.add_sample_follower(t, (t, t, t))
        if i % 10 == 3:
            ss.add_frame(t + camlag)
        while True:
            s = ss.poll_synced_sample()
            if s is None:
                break
            if s.frame is not None:
                num = s.frame.num
                if out_nums:
                    assert num == out_nums[-1] + 1
                else:
                    assert num == 1
                assert abs(s.frame.leader_time_diff - camlag) < 1e-4
                out_nums.append(num)
        i += 1
        t += dt
    assert len(out_nums) > 0


def test_out_of_order_and_late_start():
    ss = make_ss()
    assert ss.poll_synced_sample() is None

    lf_shift = 0.003
    t_acc_start, t_acc_end = 5.1, 7.8
    scale = 0.5
    samples = []
    t = 5.0
    i = 0
    while t < 8.0:
        tr = t
        if i % 6 == 2:
            tr += 0.033 * scale
        if i % 11 == 3:
            tr -= 0.011 * scale
        ss.add_sample_leader(tr, (tr, tr, tr))
        t += lf_shift
        if t_acc_start < t < t_acc_end:
            tr = t
            if i % 7 == 3:
                tr += 0.052 * scale
            if i % 3 == 2:
                tr -= 0.031 * scale
            ss.add_sample_follower(tr, (tr, tr, tr))
        if i % 10 == 3:
            ss.add_frame(t)
        t += 0.01 - lf_shift
        i += 1
        while True:
            s = ss.poll_synced_sample()
            if s is None:
                break
            assert s.t == s.l[0]
            assert s.l[0] == s.l[1]
            assert s.f[0] == s.f[1]
            samples.append(s)

    assert len(samples) > 0
    for k in range(1, len(samples)):
        assert samples[k].t >= samples[k - 1].t
        assert samples[k].f[0] >= samples[k - 1].f[0]
    for s in samples:
        if s.t < t_acc_start or s.t > t_acc_end:
            continue
        assert abs(s.t - s.tF) < 0.03
    assert ss.poll_synced_sample() is None


def test_time_shift_applied():
    ss = make_ss()
    ss.set_imu_to_camera_time_shift(0.005)
    for i in range(60):
        t = 1.0 + 0.01 * i
        ss.add_sample_leader(t, (t, t, t))
        ss.add_sample_follower(t, (t, t, t))
    ss.add_frame(1.3)  # effective time 1.295
    ss.add_frame(1.4)
    got = []
    while True:
        s = ss.poll_synced_sample()
        if s is None:
            break
        if s.frame is not None:
            got.append(s.frame.t)
    assert got and abs(got[0] - 1.295) < 1e-9
