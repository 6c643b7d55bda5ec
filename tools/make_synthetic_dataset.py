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


def make_dataset(out_dir: str, duration: float = 6.0, width: int = 320,
                 height: int = 240, fx: float = 260.0, imu_rate: float = 100.0,
                 frame_rate: float = 10.0, seed: int = 0, n_landmarks: int = 300,
                 gyro_noise: float = 5e-4, acc_noise: float = 5e-3):
    from hybvio_tpu.io.jsonl import Recorder
    from hybvio_tpu.io.synthetic import (
        SYNTH_IMU_TO_CAMERA, generate_sequence, render_view,
    )

    seq = generate_sequence(duration=duration, imu_rate=imu_rate,
                            frame_rate=frame_rate, n_landmarks=n_landmarks,
                            gyro_noise=gyro_noise, acc_noise=acc_noise, seed=seed)
    rec = Recorder(out_dir)
    # embed extrinsics + intrinsics in the data file (reference supports this)
    rec.f.write(json.dumps({
        "imuToCamera": [list(row) for row in np.asarray(SYNTH_IMU_TO_CAMERA)],
        "cameraInd": 0}) + "\n")

    cam_params = [{
        "focalLengthX": fx, "focalLengthY": fx,
        "principalPointX": width / 2, "principalPointY": height / 2}]

    fi = 0
    frame_set = set(seq.frame_sample_idx.tolist())
    for k in range(len(seq.times)):
        t = float(seq.times[k])
        rec.gyro(t, seq.gyro[k])
        rec.acc(t, seq.acc[k])
        if k in frame_set:
            img = render_view(
                seq.landmarks, seq.pos[k], seq.quat[k], SYNTH_IMU_TO_CAMERA,
                fx, fx, width / 2, height / 2, width, height, blob_sigma=1.2)
            rec.frame(t, [img], cam_params)
            rec.ground_truth(t, seq.pos[k], seq.quat[k])
            fi += 1
    rec.close()
    return out_dir, fi


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_dataset"
    dur = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
    d, n = make_dataset(out, dur)
    print(f"wrote {n} frames to {d}")
