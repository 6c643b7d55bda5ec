"""ctypes bindings for the native (C++) JSONL dataset reader.

The native library scans a data.jsonl once and returns the high-rate
sensor/frame events as packed numpy arrays (reference equivalent:
src/commandline/input_jsonl.cpp parsing with nlohmann-json on the input
thread). Rare lines (groundTruth/ARKit/gps echoes, calibration objects) come
back as byte ranges; the caller json.loads just those lazily. Falls back
transparently to the pure-Python reader when the library is not built.
"""
from __future__ import annotations

import ctypes
import json
import os
from typing import Iterator, Optional

import numpy as np

_LIB = None
_LIB_FAILED = False

KIND_GYRO = 0
KIND_ACC = 1
KIND_FRAME = 2
KIND_ECHO = 3


def _load():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(root, "native", "libhybvio_native.so")
    try:
        if not os.path.exists(path):
            import sys

            sys.path.insert(0, os.path.join(root, "tools"))
            from build_native import build

            path = build()
        lib = ctypes.CDLL(path)
        lib.hyb_jsonl_open.restype = ctypes.c_void_p
        lib.hyb_jsonl_open.argtypes = [ctypes.c_char_p]
        lib.hyb_jsonl_num_events.restype = ctypes.c_int64
        lib.hyb_jsonl_num_events.argtypes = [ctypes.c_void_p]
        lib.hyb_jsonl_num_frames.restype = ctypes.c_int64
        lib.hyb_jsonl_num_frames.argtypes = [ctypes.c_void_p]
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.hyb_jsonl_events.argtypes = [
            ctypes.c_void_p, i32p, f64p, f64p, i32p, i32p, i32p, i64p, i64p]
        lib.hyb_jsonl_frames.argtypes = [ctypes.c_void_p, f64p, i32p, i32p]
        lib.hyb_jsonl_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
        return None
    return _LIB


def native_available() -> bool:
    return _load() is not None


class PackedEvents:
    """Packed event arrays for one data.jsonl file."""

    def __init__(self, kind, time, values, frame_begin, frame_count,
                 frames_index, line_off, line_len, frames, path):
        self.kind = kind          # (N,) int32, KIND_*
        self.time = time          # (N,) float64
        self.values = values      # (N, 3) float64 (gyro/acc)
        self.frame_begin = frame_begin  # (N,) int32 index into frames
        self.frame_count = frame_count  # (N,) int32
        self.frames_index = frames_index  # (N,) int32 frame-group "number"
        self.line_off = line_off  # (N,) int64 byte offsets (echo laziness)
        self.line_len = line_len
        self.frames = frames      # (F, 5) float64: t, fx, fy, px, py
        self.frame_cam = None     # set by read_packed
        self.frame_number = None
        self.path = path

    def echo_json(self, i: int) -> dict:
        """Lazily parse the raw line of event i (KIND_ECHO)."""
        with open(self.path, "rb") as f:
            f.seek(int(self.line_off[i]))
            raw = f.read(int(self.line_len[i]))
        return json.loads(raw)


def read_packed(path: str) -> Optional[PackedEvents]:
    """Parse a data.jsonl natively into packed arrays; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    h = lib.hyb_jsonl_open(path.encode())
    if not h:
        return None
    try:
        n = int(lib.hyb_jsonl_num_events(h))
        nf = int(lib.hyb_jsonl_num_frames(h))
        kind = np.empty(n, np.int32)
        time = np.empty(n, np.float64)
        values = np.empty((n, 3), np.float64)
        frame_begin = np.empty(n, np.int32)
        frame_count = np.empty(n, np.int32)
        frames_index = np.empty(n, np.int32)
        line_off = np.empty(n, np.int64)
        line_len = np.empty(n, np.int64)
        if n:
            lib.hyb_jsonl_events(h, kind, time, values.reshape(-1),
                                 frame_begin, frame_count, frames_index,
                                 line_off, line_len)
        frames = np.empty((nf, 5), np.float64)
        frame_cam = np.empty(nf, np.int32)
        frame_number = np.empty(nf, np.int32)
        if nf:
            lib.hyb_jsonl_frames(h, frames.reshape(-1), frame_cam, frame_number)
        pe = PackedEvents(kind, time, values, frame_begin, frame_count,
                          frames_index, line_off, line_len, frames, path)
        pe.frame_cam = frame_cam
        pe.frame_number = frame_number
        return pe
    finally:
        lib.hyb_jsonl_close(h)


def iter_events(path: str) -> Optional[Iterator]:
    """Yield InputEvent objects from the native packed arrays (same stream as
    hybvio_tpu.io.jsonl.read_jsonl_events); None when the library is absent."""
    pe = read_packed(path)
    if pe is None:
        return None
    from .jsonl import ACCELEROMETER, ECHO, FRAME, GYROSCOPE, InputEvent, InputFrame

    def gen():
        for i in range(pe.kind.shape[0]):
            k = int(pe.kind[i])
            if k == KIND_GYRO or k == KIND_ACC:
                v = pe.values[i]
                yield InputEvent(GYROSCOPE if k == KIND_GYRO else ACCELEROMETER,
                                 float(pe.time[i]),
                                 values=(float(v[0]), float(v[1]), float(v[2])))
            elif k == KIND_FRAME:
                b = int(pe.frame_begin[i])
                c = int(pe.frame_count[i])
                frames = []
                for j in range(b, b + c):
                    t, fx, fy, px, py = (float(x) for x in pe.frames[j])
                    frames.append(InputFrame(
                        camera_ind=int(pe.frame_cam[j]), t=t,
                        focal_length_x=fx, focal_length_y=fy,
                        principal_point_x=px, principal_point_y=py,
                        number=int(pe.frame_number[j])))
                yield InputEvent(FRAME, frames[0].t, frames=frames,
                                 frames_index=int(pe.frames_index[i]))
            else:  # echo: parse the single line lazily
                yield InputEvent(ECHO, float(pe.time[i]), raw=pe.echo_json(i))

    return gen()
