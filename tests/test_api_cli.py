"""API + CLI integration: synthetic dataset on disk -> VioApi / CLI -> JSONL
trajectory with small ATE vs the recorded ground truth."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from hybvio_tpu.eval.ate import ate_rmse
from hybvio_tpu.io import jsonl as jio


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_synthetic_dataset import make_dataset

    out = str(tmp_path_factory.mktemp("synth"))
    make_dataset(out, duration=5.0)
    return out


def test_jsonl_round_trip(dataset):
    events = list(jio.read_jsonl_events(os.path.join(dataset, "data.jsonl")))
    kinds = [e.kind for e in events]
    assert kinds.count(jio.FRAME) >= 40
    assert kinds.count(jio.GYROSCOPE) > 400
    assert kinds.count(jio.ECHO) >= 40  # ground truth lines
    hist = jio.get_pose_histories(os.path.join(dataset, "data.jsonl"))
    assert "groundTruth" in hist and hist["groundTruth"].shape[1] == 8


def test_set_parameters_from_data(dataset):
    from hybvio_tpu.config import Parameters

    p = Parameters()
    jio.set_parameters_from_data(p, os.path.join(dataset, "data.jsonl"))
    # imuToCamera embedded as nested row-major; column-major flat result
    import numpy as np
    from hybvio_tpu.geometry.poses import vec2matrix
    from hybvio_tpu.io.synthetic import SYNTH_IMU_TO_CAMERA

    m = np.asarray(vec2matrix(p.odometry.imuToCameraMatrix))
    np.testing.assert_allclose(m, SYNTH_IMU_TO_CAMERA)


@pytest.mark.slow
def test_api_end_to_end(dataset):
    from hybvio_tpu.api.vio import VioApi
    from hybvio_tpu.config import Parameters

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
    p.odometry.visualR = 0.3  # matched to the front-end's LK noise on renders

    api = VioApi(p, 320, 240)
    outputs = []
    api.on_output = outputs.append

    from hybvio_tpu.io.video import open_frame_source

    frames = open_frame_source(dataset)
    n = 0
    for ev in jio.read_jsonl_events(os.path.join(dataset, "data.jsonl")):
        if ev.kind == jio.GYROSCOPE:
            api.add_gyro(ev.t, ev.values)
        elif ev.kind == jio.ACCELEROMETER:
            api.add_acc(ev.t, ev.values)
        elif ev.kind == jio.FRAME:
            num = ev.frames_index if ev.frames_index >= 0 else n
            api.add_frame_mono(ev.t, frames.frame(num))
            n += 1

    assert len(outputs) > 30
    est_t = np.array([o.t for o in outputs])
    est = np.stack([o.position for o in outputs])
    assert np.isfinite(est).all()

    gt_hist = jio.get_pose_histories(os.path.join(dataset, "data.jsonl"))["groundTruth"]
    # match by time
    gt = np.stack([gt_hist[np.argmin(np.abs(gt_hist[:, 0] - t)), 1:4] for t in est_t])
    gt = gt - gt_hist[0, 1:4]
    ate = ate_rmse(est, gt)
    assert ate < 0.08, ate

    # JSON output format
    j = json.loads(outputs[-1].as_json())
    assert set(j) >= {"time", "position", "orientation", "velocity"}
    assert set(j["orientation"]) == {"w", "x", "y", "z"}


@pytest.mark.slow
def test_cli_runner(dataset, tmp_path):
    """The offline CLI runner end to end (in-process; reference `main` flags)."""
    from hybvio_tpu.cli.main import run

    out_path = str(tmp_path / "out.jsonl")
    rc = run([f"-i={dataset}", f"-o={out_path}", "-maxFrames=25",
              "-visualR=0.3", "-cameraTrailLength=6", "-maxTracks=32",
              "-pyrLKWindowSize=13", "-pyrLKMaxLevel=2", "-gfttMinDistance=30",
              "-focalLength=260", "-principalPointX=160", "-principalPointY=120",
              "-outputJsonExtras"])
    assert rc == 0
    lines = [json.loads(l) for l in open(out_path)]
    assert len(lines) >= 15
    last = lines[-1]
    assert set(last) >= {"time", "position", "orientation", "velocity", "status"}
    # reference extras shape (api.cpp:817-860)
    assert set(last["biasMean"]) == {"gyroscopeAdditive", "accelerometerAdditive"}
    assert set(last["biasCovarianceDiagonal"]) >= {
        "gyroscopeAdditive", "accelerometerAdditive", "accelerometerTransform"}
    assert len(last["positionCovariance"]) == 3
    assert len(last["velocityCovariance"]) == 3
    assert last["focalLength"] == 260.0


@pytest.mark.slow
def test_api_worker_thread(dataset):
    """processingQueueSize > 0 runs odometry on a worker thread (reference:
    controlProcessingQueue, api.cpp:1019) and produces a sane trajectory."""
    from hybvio_tpu.api.vio import VioApi
    from hybvio_tpu.config import Parameters

    p = Parameters()
    jio.set_parameters_from_data(p, os.path.join(dataset, "data.jsonl"))
    p.tracker.focalLength = 260.0
    p.tracker.principalPointX = 160.0
    p.tracker.principalPointY = 120.0
    p.tracker.maxTracks = 48
    p.odometry.cameraTrailLength = 8
    p.odometry.visualR = 0.3
    p.tracker.gfttMinDistance = 25.0
    p.tracker.pyrLKMaxLevel = 2
    p.odometry.processingQueueSize = 3

    api = VioApi(p, 320, 240)
    outs = []
    api.on_output = outs.append

    from make_synthetic_dataset import make_dataset  # noqa: F401 (fixture dep)
    frames = __import__("hybvio_tpu.io.video", fromlist=["open_frame_source"]) \
        .open_frame_source(dataset)
    n = 0
    for ev in jio.read_jsonl_events(os.path.join(dataset, "data.jsonl")):
        if ev.kind == jio.GYROSCOPE:
            api.add_gyro(ev.t, ev.values)
        elif ev.kind == jio.ACCELEROMETER:
            api.add_acc(ev.t, ev.values)
        elif ev.kind == jio.FRAME:
            api.add_frame_mono(ev.t, frames.frame(n, 0))
            n += 1
            if n >= 25:
                break
    api.finish()
    assert len(outs) >= 15
    est = np.stack([o.position for o in outs])
    assert np.isfinite(est).all()
    assert np.linalg.norm(est[-1]) < 10.0


def test_csv_events_parsing(tmp_path):
    """Legacy numeric-code CSV rows parse to the same event stream shapes as
    JSONL (reference: input_csv.cpp:128-193)."""
    csv = tmp_path / "data.csv"
    csv.write_text("\n".join([
        "0.00,4,0.01,0.02,0.03",          # gyro
        "0.00,3,0.1,9.8,0.2",             # acc
        "0.01,1,0,260.0,262.0,160.0,120.0",  # frame 0 with intrinsics
        "0.02,2,60.17,24.94,5.0,12.0",    # gps lat,lon,accuracy,alt
        "0.03,7,1,1.0,2.0,3.0,0,0,0,250.0,252.0",  # ARKit row = frame 1
    ]) + "\n")
    evs = list(jio.read_csv_events(str(csv)))
    kinds = [e.kind for e in evs]
    assert kinds == [jio.GYROSCOPE, jio.ACCELEROMETER, jio.FRAME, jio.ECHO,
                     jio.ECHO, jio.FRAME]
    fr = evs[2].frames[0]
    assert fr.focal_length_x == 260.0 and fr.principal_point_x == 160.0
    assert evs[3].raw["gps"]["latitude"] == 60.17
    # ARKit overlay axes reordered x<-v[5] (input_csv.cpp:281-287)
    assert evs[4].raw["ARKit"]["position"] == {"x": 3.0, "y": 1.0, "z": 2.0}
    assert evs[5].frames[0].focal_length_x == 251.0
    assert evs[5].frames_index == 1


@pytest.mark.slow
def test_cli_runner_csv_input(dataset, tmp_path):
    """A data.csv folder dataset drives the same pipeline as data.jsonl."""
    import shutil

    from hybvio_tpu.cli.main import run

    csv_ds = tmp_path / "csvds"
    csv_ds.mkdir()
    # frames: reuse the synthetic npy frames; sensors: convert JSONL -> CSV
    for f in os.listdir(dataset):
        if f.endswith(".npy"):
            shutil.copy(os.path.join(dataset, f), csv_ds / f)
    rows = []
    for ev in jio.read_jsonl_events(os.path.join(dataset, "data.jsonl")):
        if ev.kind == jio.GYROSCOPE:
            rows.append(f"{ev.t},4,{ev.values[0]},{ev.values[1]},{ev.values[2]}")
        elif ev.kind == jio.ACCELEROMETER:
            rows.append(f"{ev.t},3,{ev.values[0]},{ev.values[1]},{ev.values[2]}")
        elif ev.kind == jio.FRAME:
            rows.append(f"{ev.t},1,{ev.frames_index}")
    (csv_ds / "data.csv").write_text("\n".join(rows) + "\n")

    out_path = str(tmp_path / "out_csv.jsonl")
    rc = run([f"-i={csv_ds}", f"-o={out_path}", "-maxFrames=25",
              "-visualR=0.3", "-cameraTrailLength=6", "-maxTracks=32",
              "-pyrLKWindowSize=13", "-pyrLKMaxLevel=2", "-gfttMinDistance=30",
              "-focalLength=260", "-principalPointX=160",
              "-principalPointY=120"])
    assert rc == 0
    lines = [json.loads(l) for l in open(out_path)]
    assert len(lines) >= 15


@pytest.mark.slow
def test_cli_recording_pointcloud_visu_resize(dataset, tmp_path):
    """-recordingPath/-pc/-displayPose/-targetFrameWidth flag parity
    (reference: cmd_parameter_definitions.json main group)."""
    from hybvio_tpu.cli.main import run

    rec = tmp_path / "rec" / "session.jsonl"
    pc = str(tmp_path / "cloud.csv")
    vis = str(tmp_path / "vis")
    out_path = str(tmp_path / "out.jsonl")
    rc = run([f"-inputPath={dataset}", f"-outputPath={out_path}",
              f"-recordingPath={rec}", f"-pc={pc}",
              "-displayPose", "-displayCovarianceMagnitude",
              "-displayVideo", "-displayCornerMeasure",
              "-displayOpticalFlow=FAILURES",
              f"-visualizationPath={vis}", "-visuUpdateInterval=5",
              "-targetFrameWidth=240", "-frames=20",
              "-visualR=0.3", "-cameraTrailLength=6", "-maxTracks=32",
              "-pyrLKWindowSize=13", "-pyrLKMaxLevel=2", "-gfttMinDistance=25",
              "-focalLength=260", "-principalPointX=160",
              "-principalPointY=120"])
    assert rc == 0
    assert len(open(out_path).readlines()) >= 10
    # recording JSONL replays: same event kinds as the input, scaled frames
    evs = list(jio.read_jsonl_events(str(rec)))
    kinds = [e.kind for e in evs]
    assert kinds.count(jio.FRAME) == 20 and kinds.count(jio.GYROSCOPE) > 100
    # point cloud CSV rows: t,id,x,y,z
    rows = [l.split(",") for l in open(pc).read().splitlines() if l]
    assert rows and all(len(r) == 5 for r in rows)
    # visualization dumps written every 5th output
    vfiles = sorted(os.listdir(vis))
    assert any(f.startswith("pose_") for f in vfiles)
    assert any(f.startswith("cov_") for f in vfiles)
    # video visualization modes (reference: VisualizationMode dispatch)
    assert any(f.startswith("video_") for f in vfiles)
    assert any(f.startswith("corner_") for f in vfiles)
    assert any(f.startswith("flow_") for f in vfiles)
    # resized: scaled focal length must produce a sane trajectory scale
    est = np.array([[json.loads(l)["position"][k] for k in "xyz"]
                    for l in open(out_path)])
    assert np.isfinite(est).all()


@pytest.mark.slow
def test_api_state_surgery(dataset):
    """lockBiases / conditionOnLastPose API parity (reference:
    internal.hpp:246-247; ekf.cpp:928-947)."""
    from hybvio_tpu.api.vio import VioApi
    from hybvio_tpu.config import Parameters

    p = Parameters()
    jio.set_parameters_from_data(p, os.path.join(dataset, "data.jsonl"))
    p.tracker.focalLength = 260.0
    p.tracker.principalPointX = 160.0
    p.tracker.principalPointY = 120.0
    p.tracker.maxTracks = 32
    p.odometry.cameraTrailLength = 6
    p.tracker.pyrLKMaxLevel = 2

    api = VioApi(p, 320, 240)
    api.lock_biases()  # no-op before init
    n = [0]
    api.on_output = lambda o: n.__setitem__(0, n[0] + 1)
    for ev in jio.read_jsonl_events(os.path.join(dataset, "data.jsonl")):
        if ev.kind == jio.GYROSCOPE:
            api.add_gyro(ev.t, ev.values)
        elif ev.kind == jio.ACCELEROMETER:
            api.add_acc(ev.t, ev.values)
        elif ev.kind == jio.FRAME:
            from hybvio_tpu.io.video import open_frame_source
            if not hasattr(api, "_test_src"):
                api._test_src = open_frame_source(dataset)
            api.add_frame_mono(ev.t, api._test_src.frame(ev.frames_index, 0))
            if n[0] >= 10:
                break
    assert n[0] >= 10
    P_before = np.asarray(api._state.backend.ekf.P)
    api.lock_biases()
    P_locked = np.asarray(api._state.backend.ekf.P)
    # bias blocks (BGA 10:13, BAA 13:16) must be zeroed
    assert np.abs(P_locked[10:16, :]).max() == 0.0
    assert np.abs(P_locked[:, 10:16]).max() == 0.0
    assert np.abs(P_before[10:16, 10:16]).max() > 0.0

    api.condition_on_last_pose()
    P_cond = np.asarray(api._state.backend.ekf.P)
    assert np.isfinite(P_cond).all()
    # conditioning can only shrink marginal variances
    assert np.diag(P_cond)[:3].max() <= np.diag(P_locked)[:3].max() + 1e-9


def test_cli_stepmode_and_vu_stats(dataset, tmp_path, capsys):
    """-stepMode gates frames on stdin keys (reference: command_queue.cpp
    step-mode blocking) and -printVisualUpdateStats wires VisualUpdateStats
    (reference: visual_update_stats.hpp)."""
    import io
    import subprocess
    import sys as _sys

    out_path = str(tmp_path / "out.jsonl")
    proc = subprocess.run(
        [_sys.executable, "-m", "hybvio_tpu.cli.main", f"-i={dataset}",
         f"-o={out_path}", "-maxFrames=6", "-stepMode",
         "-printVisualUpdateStats", "-visualR=0.3", "-cameraTrailLength=6",
         "-maxTracks=32", "-focalLength=260", "-principalPointX=160",
         "-principalPointY=120"],
        input="\n" * 40, capture_output=True, text=True, timeout=900,
        cwd="/root/repo",
        env={**__import__("os").environ, "HYBVIO_PLATFORM": "cpu"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "processed 6 frames" in proc.stderr
    assert "visual update stats" in proc.stderr  # totals report printed


def test_gray_pool_reuse():
    """The pooled gray conversion must reuse buffers once free and never
    corrupt frames still referenced (reference: allocator.hpp semantics)."""
    from hybvio_tpu.api.vio import VioApi
    from hybvio_tpu.config import Parameters

    p = Parameters()
    p.tracker.focalLength = 100.0
    p.tracker.principalPointX = 32.0
    p.tracker.principalPointY = 24.0
    api = VioApi.__new__(VioApi)  # no heavy init; just the pieces _to_gray uses
    api.width, api.height = 64, 48
    import numpy as np

    from hybvio_tpu.utils.allocator import Allocator

    api._gray_pool = Allocator(lambda: np.empty((48, 64), np.float32), max_size=16)
    api._u8_pool = Allocator(lambda: np.empty((48, 64), np.uint8), max_size=16)
    # uint8 frames stay uint8 (pooled copy; normalization happens on device)
    img = (np.arange(48 * 64, dtype=np.uint8).reshape(48, 64) % 251)
    g1 = api._to_gray(img)
    assert g1.dtype == np.uint8
    np.testing.assert_array_equal(g1, img)
    held = g1  # keep a reference: the next call must NOT reuse this slot
    g2 = api._to_gray(img + 1)
    assert g2 is not held
    del held
    g3 = api._to_gray(img)  # g1's slot is free now; pool may reuse it
    np.testing.assert_array_equal(g3, img)
    # non-f32 float frames convert into the pooled float32 gray buffers
    imgf = (img.astype(np.float64) / 255.0)
    f1 = api._to_gray(imgf)
    assert f1.dtype == np.float32
    np.testing.assert_allclose(f1, imgf, rtol=1e-6)
    heldf = f1
    f2 = api._to_gray(imgf * 0.5)
    assert f2 is not heldf
    del heldf
    f3 = api._to_gray(imgf)
    np.testing.assert_allclose(f3, imgf, rtol=1e-6)


@pytest.mark.slow
def test_debug_publisher_sites(dataset):
    """DebugPublisher hooks fire from the API frame loop (reference publish
    sites: backend.cpp:751-757,1061-1064,1197-1201; triangulation.cpp:148-150):
    per-VU start/triangulation/success events + per-frame point clouds."""
    from hybvio_tpu.api.vio import VioApi
    from hybvio_tpu.config import Parameters
    from hybvio_tpu.odometry.debug import DebugAPI, RecordingPublisher

    p = Parameters()
    jio.set_parameters_from_data(p, os.path.join(dataset, "data.jsonl"))
    p.tracker.focalLength = 260.0
    p.tracker.principalPointX = 160.0
    p.tracker.principalPointY = 120.0
    p.tracker.maxTracks = 32
    p.odometry.cameraTrailLength = 6
    p.tracker.pyrLKWindowSize = 15
    p.tracker.pyrLKMaxLevel = 2
    p.tracker.gfttMinDistance = 25.0
    p.odometry.visualR = 0.3

    api = VioApi(p, 320, 240)
    pub = RecordingPublisher()
    api.debug_api = DebugAPI(publisher=pub)

    from hybvio_tpu.io.video import open_frame_source

    frames = open_frame_source(dataset)
    n = 0
    for ev in jio.read_jsonl_events(os.path.join(dataset, "data.jsonl")):
        if ev.kind == jio.GYROSCOPE:
            api.add_gyro(ev.t, ev.values)
        elif ev.kind == jio.ACCELEROMETER:
            api.add_acc(ev.t, ev.values)
        elif ev.kind == jio.FRAME:
            num = ev.frames_index if ev.frames_index >= 0 else n
            api.add_frame_mono(ev.t, frames.frame(num))
            n += 1
            if n >= 20:
                break

    assert len(pub.frames) >= 15
    assert len(pub.visual_updates) > 0
    assert len(pub.successful_updates) > 0
    assert len(pub.triangulations) > 0
    assert len(pub.point_clouds) > 0
    # successful updates are a subset of started ones
    assert set(pub.successful_updates) <= set(pub.visual_updates)
    # triangulated points are finite 3-vectors
    assert all(np.isfinite(x).all() and x.shape == (3,)
               for x in pub.triangulations)
