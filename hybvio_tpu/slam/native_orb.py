"""ctypes bindings for the native (C++) multi-scale ORB keypoint detector.

Same contract as slam/keypoints.make_multiscale_orb (the JAX host-backend
detector): fn(image) -> (pts (N,2) level-0 xy, level (N,) int32,
desc (N,256) +/-1, valid (N,)). The BRIEF pattern is passed IN from
slam/orb.py so native and JAX descriptors sample identical pairs.

Why native: the SLAM worker runs at keyframe rate on the host CPU
(slam/host.py); the XLA CPU build of the detector costs ~75 s to compile and
~0.66 s per 752x480 keyframe, which stalls the async worker into dropping
keyframes. The C++ detector runs the same contract in milliseconds — the
reference's SLAM thread is native C++ for the same reason.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(root, "native", "libhybvio_native.so")
    try:
        import sys

        sys.path.insert(0, os.path.join(root, "tools"))
        from build_native import build

        path = build()  # no-op when the .so is newer than the sources
    except Exception:
        if not os.path.exists(path):
            return None
    lib = ctypes.CDLL(path)
    if not hasattr(lib, "orb_create"):
        return None  # stale library without the detector
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.orb_create.restype = ctypes.c_void_p
    lib.orb_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        f32p, f32p, ctypes.c_int]
    lib.orb_destroy.argtypes = [ctypes.c_void_p]
    lib.orb_capacity.argtypes = [ctypes.c_void_p]
    lib.orb_capacity.restype = ctypes.c_int
    lib.orb_detect.restype = ctypes.c_int
    lib.orb_detect.argtypes = [
        ctypes.c_void_p, f32p, f32p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_uint8)]
    _LIB = lib
    return lib


def native_orb_available() -> bool:
    return (os.environ.get("HYBVIO_NATIVE_ORB", "1") != "0"
            and _load() is not None)


def make_native_orb(H: int, W: int, n_levels: int = 8,
                    scale_factor: float = 1.2, total_kps: int = 256,
                    thr_init: float = 20.0 / 255.0,
                    thr_min: float = 7.0 / 255.0, cell: int = 16):
    """Drop-in for keypoints.make_multiscale_orb backed by C++."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    from .orb import _PAIRS_A, _PAIRS_B, N_BITS

    pa = np.ascontiguousarray(_PAIRS_A, np.float32)
    pb = np.ascontiguousarray(_PAIRS_B, np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    h = lib.orb_create(H, W, n_levels, float(scale_factor), float(thr_init),
                       float(thr_min), int(total_kps), int(cell),
                       pa.ctypes.data_as(f32p), pb.ctypes.data_as(f32p),
                       N_BITS)
    N = lib.orb_capacity(h)

    class _Holder:
        """Owns the native handle for the closure's lifetime."""

        def __init__(self, handle):
            self.handle = handle

        def __del__(self):
            try:
                lib.orb_destroy(self.handle)
            except Exception:
                pass

    holder = _Holder(h)

    def detect(img):
        img = np.ascontiguousarray(img, np.float32)
        assert img.shape == (H, W), (img.shape, (H, W))
        pts = np.empty((N, 2), np.float32)
        lvl = np.empty((N,), np.int32)
        desc = np.empty((N, N_BITS), np.int8)
        ok = np.empty((N,), np.uint8)
        lib.orb_detect(
            holder.handle, img.ctypes.data_as(f32p),
            pts.ctypes.data_as(f32p),
            lvl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            desc.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return pts, lvl, desc.astype(np.float32), ok.astype(bool)

    return detect, N
