"""Offline CLI runner (the reference `main` binary equivalent).

Usage:
    python -m hybvio_tpu.cli.main -i=<dataset_dir> [-o=<output.jsonl>]
        [-p=<parameters.txt>] [-c=<calibration.json>] [any -paramName=value]

Dataset directory layout (reference: src/commandline/main.cpp:259-397):
    data.jsonl                 sensor + frame metadata (+ embedded calibration)
    parameters.txt / vio_config.yaml   optional parameters
    calibration.json           optional calibration
    data.{mp4,avi,...} or frame_*.npy or an image directory for frames

Configuration precedence mirrors the reference (main.cpp:298-327):
    data.jsonl-embedded -> parameters.txt/vio_config.yaml -> calibration.json
    -> command line (last, highest).
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional

import numpy as np


def find_frame_source_path(dataset_dir: str) -> Optional[str]:
    for ext in (".mp4", ".mov", ".avi"):
        p = os.path.join(dataset_dir, "data" + ext)
        if os.path.exists(p):
            return p
    if os.path.exists(os.path.join(dataset_dir, "frame_000000_cam0.npy")):
        return dataset_dir
    for sub in ("frames", "cam0/data", "mav0/cam0/data"):
        p = os.path.join(dataset_dir, sub)
        if os.path.isdir(p):
            return p
    return None


def run(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)

    from ..config import Parameters
    from ..config.loader import apply_argv, apply_calibration_json, apply_parameters_text, apply_yaml
    from ..io import jsonl as jio
    from ..io.video import open_frame_source

    # pull out main-level flags first
    main_flags = {}
    rest = []
    for a in argv:
        body = a.lstrip("-")
        k, _, v = body.partition("=")
        if k in ("i", "o", "p", "c", "maxFrames", "timer", "recordDir",
                 "outputType", "slamMapPosesPath", "v"):
            main_flags[k] = v if v else "true"
        else:
            rest.append(a)
    if "i" not in main_flags:
        print(__doc__)
        return 2

    from ..utils.logging import setup_logging

    setup_logging(int(main_flags.get("v", "0") if main_flags.get("v", "0") != "true" else 1))

    dataset = main_flags["i"]
    # legacy CSV input: -i=<video.mp4|.mov> with a sibling .csv (reference:
    # input_csv.cpp:66-77), or a folder containing data.csv (handled below)
    data_csv = None
    if dataset.endswith((".mp4", ".mov")) and os.path.exists(
            os.path.splitext(dataset)[0] + ".csv"):
        data_csv = os.path.splitext(dataset)[0] + ".csv"
        video_path = dataset
        dataset = os.path.dirname(dataset) or "."
    data_jsonl = os.path.join(dataset, "data.jsonl")
    params = Parameters()

    # EuRoC ASL layout (mav0/...) read directly, no JSONL conversion needed
    euroc_dir = None
    if not os.path.exists(data_jsonl):
        for cand in (dataset, os.path.join(dataset, "mav0")):
            if os.path.isdir(os.path.join(cand, "cam0")):
                euroc_dir = cand
                break
        if euroc_dir is None and data_csv is None and os.path.exists(
                os.path.join(dataset, "data.csv")):
            data_csv = os.path.join(dataset, "data.csv")

    # precedence: data.jsonl-embedded -> parameters/yaml -> calibration -> argv
    if os.path.exists(data_jsonl):
        jio.set_parameters_from_data(params, data_jsonl)
    elif euroc_dir:
        from ..io.euroc import read_euroc_calibration

        cams = read_euroc_calibration(euroc_dir)
        if cams:
            apply_calibration_json(params, json.dumps({"cameras": cams}))
    ppath = main_flags.get("p")
    if not ppath:
        for cand in ("vio_config.yaml", "parameters.txt"):
            c = os.path.join(dataset, cand)
            if os.path.exists(c):
                ppath = c
                break
    if ppath and os.path.exists(ppath):
        text = open(ppath).read()
        if ppath.endswith((".yaml", ".yml")):
            apply_yaml(params, text)
        else:
            apply_parameters_text(params, text)
    cpath = main_flags.get("c") or os.path.join(dataset, "calibration.json")
    if os.path.exists(cpath):
        apply_calibration_json(params, open(cpath).read())
    unparsed = apply_argv(params, rest)
    if unparsed:
        # unused-key error parity (reference: ParameterParser unused-key
        # checking, src/util/parameter_parser.hpp:14-28)
        print(f"error: unrecognized arguments: {unparsed}", file=sys.stderr)
        return 2

    if euroc_dir:
        frames = None  # frames loaded lazily from the per-event image paths
        import glob

        first = sorted(glob.glob(os.path.join(euroc_dir, "cam0", "data", "*")))
        if not first:
            print(f"error: no cam0 images in {euroc_dir}", file=sys.stderr)
            return 1
        from ..io.video import load_image_file

        H, W = load_image_file(first[0]).shape
    else:
        src_path = (video_path if data_csv and dataset != main_flags["i"]
                    else find_frame_source_path(dataset))
        if src_path is None:
            print(f"error: no frame source found in {dataset}", file=sys.stderr)
            return 1
        frames = open_frame_source(src_path)
        H, W = frames.shape

    def _input_events():
        if euroc_dir:
            from ..io.euroc import read_euroc_events

            return read_euroc_events(euroc_dir)
        if data_csv:
            return jio.read_csv_events(data_csv)
        return jio.read_jsonl_events(data_jsonl)

    # per-frame intrinsics embedded in the input (reference: the first
    # frame's cameraParameters configure the camera, api.cpp:528-628 via
    # input_jsonl.cpp:119-199 / input_csv.cpp:169-177) — applied only when
    # not set by other sources
    if not euroc_dir and params.tracker.focalLength < 0 \
            and params.tracker.focalLengthX < 0:
        for ev in _input_events():
            if ev.kind == jio.FRAME and ev.frames:
                fr = ev.frames[0]
                if fr.focal_length_x > 0:
                    params.tracker.focalLengthX = fr.focal_length_x
                    params.tracker.focalLengthY = (
                        fr.focal_length_y if fr.focal_length_y > 0
                        else fr.focal_length_x)
                    if fr.principal_point_x >= 0:
                        params.tracker.principalPointX = fr.principal_point_x
                        params.tracker.principalPointY = fr.principal_point_y
                break

    # videoRotation: rotate incoming frames (the imuToCamera adjustment was
    # applied during parameter parsing; reference: parameters_base.cpp:38-66)
    rot_steps = getattr(params, "videoRotationSteps", 0) % 4
    def maybe_rotate(img):
        return np.rot90(img, k=-rot_steps) if rot_steps else img
    if rot_steps % 2 == 1:
        W, H = H, W

    from ..api.vio import VioApi

    max_frames = int(main_flags.get("maxFrames", "0") or 0)
    out_file = open(main_flags["o"], "w") if main_flags.get("o") else None
    with_trail = main_flags.get("outputType") == "tail" or params.odometry.outputJsonPoseTrail

    api = VioApi(params, W, H)
    if main_flags.get("timer"):
        api.time_stats.enabled = True
    n_out = [0]
    t_start = time.time()

    def on_output(out):
        n_out[0] += 1
        if out_file:
            extras = None
            if params.odometry.outputJsonExtras:
                extras = {
                    "status": out.status,
                    "biasMeanGyroscopeAdditive": list(map(float, out.bias_gyro)),
                    "biasMeanAccelerometerAdditive": list(map(float, out.bias_acc)),
                    "stationaryVisual": out.stationary_visual,
                }
            out_file.write(out.as_json(with_trail, extras) + "\n")

    api.on_output = on_output

    events = _input_events()

    n_frames = 0
    for ev in events:
        if ev.kind == jio.GYROSCOPE:
            api.add_gyro(ev.t, ev.values)
        elif ev.kind == jio.ACCELEROMETER:
            api.add_acc(ev.t, ev.values)
        elif ev.kind == jio.ECHO:
            if ev.raw:
                api.add_echo(ev.raw)
        elif ev.kind == jio.FRAME:
            if euroc_dir:
                from ..io.video import load_image_file

                paths = ev.raw["paths"]
                img = load_image_file(paths[0])
                img2 = (load_image_file(paths[1])
                        if len(paths) > 1 and params.tracker.useStereo else None)
            else:
                num = ev.frames_index if ev.frames_index >= 0 else n_frames
                img = frames.frame(num, 0)
                img2 = (frames.frame(num, 1)
                        if len(ev.frames) > 1 and params.tracker.useStereo else None)
            if img2 is not None:
                api.add_frame_stereo(ev.t, maybe_rotate(img), maybe_rotate(img2))
            else:
                api.add_frame_mono(ev.t, maybe_rotate(img))
            n_frames += 1
            if max_frames and n_frames >= max_frames:
                break

    api.finish(slam_map_poses_path=main_flags.get("slamMapPosesPath"))
    elapsed = time.time() - t_start
    if out_file:
        out_file.close()
    print(f"processed {n_frames} frames, {n_out[0]} outputs in {elapsed:.1f}s "
          f"({n_frames / max(elapsed, 1e-9):.1f} fps)", file=sys.stderr)
    if main_flags.get("timer"):
        print(api.time_stats.report(), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(run())
