"""ctypes bindings for the native (C++) sample synchronizer.

The native library implements the same leader/follower/frame pairing as
hybvio_tpu/odometry/sample_sync.py (reference semantics:
src/odometry/sample_sync.cpp); this wrapper keeps the frame payloads (numpy
images) on the Python side, passing only integer handles through the C ABI.
Falls back transparently to the pure-Python SampleSync when the library is
not built (tools/build_native.py builds it with g++).
"""
from __future__ import annotations

import ctypes
import os
from typing import Any, Dict, Optional

from ..odometry.sample_sync import ProcessedFrame, SyncedSample

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(root, "native", "libhybvio_native.so")
    if not os.path.exists(path):
        try:
            import sys

            sys.path.insert(0, os.path.join(root, "tools"))
            from build_native import build

            path = build()
        except Exception:
            return None
    lib = ctypes.CDLL(path)
    lib.sample_sync_create.restype = ctypes.c_void_p
    lib.sample_sync_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double]
    lib.sample_sync_destroy.argtypes = [ctypes.c_void_p]
    d3 = ctypes.POINTER(ctypes.c_double)
    lib.sample_sync_add_leader.argtypes = [ctypes.c_void_p, ctypes.c_double, d3]
    lib.sample_sync_add_follower.argtypes = [ctypes.c_void_p, ctypes.c_double, d3]
    lib.sample_sync_add_frame.argtypes = [ctypes.c_void_p, ctypes.c_double, ctypes.c_int64]
    lib.sample_sync_add_frame.restype = ctypes.c_int
    lib.sample_sync_set_time_shift.argtypes = [ctypes.c_void_p, ctypes.c_double]
    lib.sample_sync_poll.restype = ctypes.c_int
    lib.sample_sync_poll.argtypes = [
        ctypes.c_void_p, d3, d3, d3, d3,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64), d3]
    lib.sample_sync_frame_queue_size.argtypes = [ctypes.c_void_p]
    lib.sample_sync_frame_queue_size.restype = ctypes.c_int
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class NativeSampleSync:
    """Drop-in replacement for odometry.sample_sync.SampleSync backed by C++."""

    def __init__(self, po):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not available; run tools/build_native.py")
        self._lib = lib
        self._h = lib.sample_sync_create(
            int(po.sampleSyncLag), int(po.sampleSyncFrameBufferSize),
            int(po.sampleSyncFrameCount), 1 if po.visualUpdateEnabled else 0,
            float(po.imuToCameraShiftSeconds))
        self._frames: Dict[int, ProcessedFrame] = {}
        self._next_handle = 1

    def __del__(self):
        try:
            self._lib.sample_sync_destroy(self._h)
        except Exception:
            pass

    @staticmethod
    def _vec(v):
        return (ctypes.c_double * 3)(float(v[0]), float(v[1]), float(v[2]))

    def add_sample_leader(self, t, p):
        self._lib.sample_sync_add_leader(self._h, float(t), self._vec(p))

    def add_sample_follower(self, t, p):
        self._lib.sample_sync_add_follower(self._h, float(t), self._vec(p))

    def add_frame(self, t, first_image=None, second_image=None, tag=None,
                  intrinsics=None):
        handle = self._next_handle
        self._next_handle += 1
        fr = ProcessedFrame(t=float(t), first_image=first_image,
                            second_image=second_image, tag=tag,
                            intrinsics=intrinsics)
        kept = self._lib.sample_sync_add_frame(self._h, float(t), handle)
        if kept:
            self._frames[handle] = fr
        # drop stale payloads if the native side culled its queue
        qn = self._lib.sample_sync_frame_queue_size(self._h)
        if len(self._frames) > max(qn * 2, 16):
            keep = sorted(self._frames)[-max(qn * 2, 16):]
            self._frames = {k: self._frames[k] for k in keep}

    def set_imu_to_camera_time_shift(self, t):
        self._lib.sample_sync_set_time_shift(self._h, float(t))

    def poll_synced_sample(self) -> Optional[SyncedSample]:
        t = ctypes.c_double()
        tF = ctypes.c_double()
        gyro = (ctypes.c_double * 3)()
        acc = (ctypes.c_double * 3)()
        fh = ctypes.c_int64()
        fn = ctypes.c_int64()
        ft = ctypes.c_double()
        ok = self._lib.sample_sync_poll(
            self._h, ctypes.byref(t), gyro, ctypes.byref(tF), acc,
            ctypes.byref(fh), ctypes.byref(fn), ctypes.byref(ft))
        if not ok:
            return None
        out = SyncedSample(t=t.value, l=tuple(gyro), tF=tF.value, f=tuple(acc))
        if fh.value >= 0:
            fr = self._frames.pop(fh.value, None)
            if fr is not None:
                fr.num = int(fn.value)
                fr.t = ft.value
                out.frame = fr
        return out
