#!/usr/bin/env python
"""Write a synthetic VIO dataset to disk in the reference JSONL format
(data.jsonl + frame_*.npy + ground truth), runnable by the CLI:

    python tools/make_synthetic_dataset.py out_dir [duration] [WxH]
    python -m hybvio_tpu.cli.main -i=out_dir -o=out.jsonl
"""
import json
import os
import sys

import numpy as np



import os
import sys

# run from anywhere without touching PYTHONPATH (the axon jax
# plugin lives on the ambient PYTHONPATH; don't make users replace it)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
def make_dataset(out_dir: str, duration: float = 6.0, width: int = 320,
                 height: int = 240, fx: float = 260.0, imu_rate: float = 100.0,
                 frame_rate: float = 10.0, seed: int = 0, n_landmarks: int = 300,
                 gyro_noise: float = 5e-4, acc_noise: float = 5e-3,
                 world: str = "textured", zoom: float = 0.0):
    """world='textured' (default): ray-cast value-noise scene — realistic
    dense gradients for LK/GFTT (io/textured.py). world='blobs': the round-1
    Gaussian-blob renderer (kept for comparisons).

    zoom: fractional focal-length ramp over the run (a synthetic autofocus /
    zooming lens): frame i renders and records fx * (1 + zoom * i/(n-1)) via
    per-frame cameraParameters (reference: input_jsonl.cpp:119-199 consumes
    these per frame). Requires world='blobs' (the textured renderer bakes its
    camera)."""
    if zoom:
        assert world == "blobs", "zoom requires the blobs renderer"
    from hybvio_tpu.io.jsonl import Recorder
    from hybvio_tpu.io.synthetic import (
        SYNTH_IMU_TO_CAMERA, generate_sequence, render_view,
    )

    seq = generate_sequence(duration=duration, imu_rate=imu_rate,
                            frame_rate=frame_rate, n_landmarks=n_landmarks,
                            gyro_noise=gyro_noise, acc_noise=acc_noise, seed=seed)
    if world == "textured":
        from hybvio_tpu.io.textured import TexturedScene, textured_frame_renderer

        scene = TexturedScene(seed=seed, wall_radius=6.0)
        render_tex = textured_frame_renderer(
            scene, seq, SYNTH_IMU_TO_CAMERA, fx, fx, width / 2, height / 2,
            width, height)
    rec = Recorder(out_dir)
    # embed extrinsics + intrinsics in the data file (reference supports this)
    rec.f.write(json.dumps({
        "imuToCamera": [list(row) for row in np.asarray(SYNTH_IMU_TO_CAMERA)],
        "cameraInd": 0}) + "\n")
    # per-dataset tracker tuning, exactly like the reference ships a
    # parameters.txt per benchmark dataset (README.md:83): this world's LK
    # localization error is ~1-3 px (motion smear on the ray-cast renders),
    # so the RANSAC inlier gates must be wider than the 2 px defaults that
    # assume sharp imagery — measured: the GROUND-TRUTH essential matrix
    # explains only ~40% of genuine tracks at the defaults here
    with open(os.path.join(out_dir, "parameters.txt"), "w") as pf:
        pf.write("ransac2Threshold 8.0;\nransac5Threshold 4.0;\n"
                 "visualR 0.5;\n")

    n_total = len(seq.frame_sample_idx)

    def fx_at(i):
        return fx * (1.0 + zoom * i / max(n_total - 1, 1)) if zoom else fx

    fi = 0
    frame_set = set(seq.frame_sample_idx.tolist())
    for k in range(len(seq.times)):
        t = float(seq.times[k])
        rec.gyro(t, seq.gyro[k])
        rec.acc(t, seq.acc[k])
        if k in frame_set:
            fxi = fx_at(fi)
            cam_params = [{
                "focalLengthX": fxi, "focalLengthY": fxi,
                "principalPointX": width / 2, "principalPointY": height / 2}]
            if world == "textured":
                img = render_tex(fi)
            else:
                img = render_view(
                    seq.landmarks, seq.pos[k], seq.quat[k], SYNTH_IMU_TO_CAMERA,
                    fxi, fxi, width / 2, height / 2, width, height, blob_sigma=1.2)
            rec.frame(t, [img], cam_params)
            rec.ground_truth(t, seq.pos[k], seq.quat[k])
            fi += 1
    rec.close()
    return out_dir, fi


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_dataset"
    dur = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
    world = sys.argv[3] if len(sys.argv) > 3 else "textured"
    d, n = make_dataset(out, dur, world=world)
    print(f"wrote {n} frames to {d} ({world})")


def make_euroc_dataset(out_dir: str, duration: float = 4.0, width: int = 320,
                       height: int = 240, fx: float = 260.0,
                       imu_rate: float = 100.0, frame_rate: float = 10.0,
                       seed: int = 0, n_landmarks: int = 300,
                       gyro_noise: float = 5e-4, acc_noise: float = 5e-3,
                       stereo: bool = False, baseline: float = 0.11):
    """Write the same synthetic sequence in the EuRoC ASL (mav0) layout:
    cam*/data.csv + data/*.png + sensor.yaml, imu0/data.csv,
    state_groundtruth_estimate0/data.csv."""
    from PIL import Image

    from hybvio_tpu.io.synthetic import (
        SYNTH_IMU_TO_CAMERA, generate_sequence, render_view,
    )

    seq = generate_sequence(duration=duration, imu_rate=imu_rate,
                            frame_rate=frame_rate, n_landmarks=n_landmarks,
                            gyro_noise=gyro_noise, acc_noise=acc_noise,
                            seed=seed)
    i2cs = [np.asarray(SYNTH_IMU_TO_CAMERA)]
    if stereo:
        second = i2cs[0].copy()
        second[0, 3] = -baseline
        i2cs.append(second)

    def yaml_for(i2c):
        T_BS = np.linalg.inv(i2c)
        rows = ",\n        ".join(
            ", ".join(f"{v:.12f}" for v in row) for row in T_BS)
        return (
            "%YAML:1.0\n"
            "sensor_type: camera\n"
            "T_BS:\n  rows: 4\n  cols: 4\n"
            f"  data: [{rows}]\n"
            "rate_hz: {:g}\n".format(frame_rate) +
            f"resolution: [{width}, {height}]\n"
            "camera_model: pinhole\n"
            f"intrinsics: [{fx}, {fx}, {width / 2}, {height / 2}]\n"
            "distortion_model: radial-tangential\n"
            "distortion_coefficients: [0.0, 0.0, 0.0, 0.0]\n")

    to_ns = lambda t: int(round(t * 1e9))
    for ci, i2c in enumerate(i2cs):
        cdir = os.path.join(out_dir, f"cam{ci}")
        os.makedirs(os.path.join(cdir, "data"), exist_ok=True)
        with open(os.path.join(cdir, "sensor.yaml"), "w") as f:
            f.write(yaml_for(i2c))
        with open(os.path.join(cdir, "data.csv"), "w") as f:
            f.write("#timestamp [ns],filename\n")
            for k in seq.frame_sample_idx:
                ns = to_ns(seq.times[k])
                img = render_view(
                    seq.landmarks, seq.pos[k], seq.quat[k], i2c,
                    fx, fx, width / 2, height / 2, width, height,
                    blob_sigma=1.2)
                Image.fromarray(
                    np.clip(img * 255, 0, 255).astype(np.uint8)).save(
                        os.path.join(cdir, "data", f"{ns}.png"))
                f.write(f"{ns},{ns}.png\n")

    idir = os.path.join(out_dir, "imu0")
    os.makedirs(idir, exist_ok=True)
    with open(os.path.join(idir, "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for k in range(len(seq.times)):
            g, a = seq.gyro[k], seq.acc[k]
            f.write(f"{to_ns(seq.times[k])},{g[0]},{g[1]},{g[2]},"
                    f"{a[0]},{a[1]},{a[2]}\n")

    gdir = os.path.join(out_dir, "state_groundtruth_estimate0")
    os.makedirs(gdir, exist_ok=True)
    with open(os.path.join(gdir, "data.csv"), "w") as f:
        f.write("#timestamp,p,q,v,bw,ba\n")
        for k in seq.frame_sample_idx:
            p, q = seq.pos[k], seq.quat[k]
            f.write(f"{to_ns(seq.times[k])},{p[0]},{p[1]},{p[2]},"
                    f"{q[0]},{q[1]},{q[2]},{q[3]}\n")
    return out_dir, len(seq.frame_sample_idx)
