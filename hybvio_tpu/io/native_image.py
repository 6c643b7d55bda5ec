"""ctypes bindings for the native image decoder (native/image_decode.cpp).

PNG (8/16-bit gray, RGB(A), gray+alpha) and PGM (P5) to float32 [0,1]
grayscale. The C call releases the GIL, so prefetch threads decode in
parallel with device compute (reference role: the OpenCV/ffmpeg reader
threads, src/commandline/video_input.cpp:23-58).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_LIB_FAILED = False


def _load():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(root, "native", "libhybvio_native.so")
    try:
        import sys

        sys.path.insert(0, os.path.join(root, "tools"))
        from build_native import build

        path = build()
        lib = ctypes.CDLL(path)
        lib.hyb_img_probe.restype = ctypes.c_int
        lib.hyb_img_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.hyb_img_decode.restype = ctypes.c_int
        lib.hyb_img_decode.argtypes = [
            ctypes.c_char_p, f32p, ctypes.c_int, ctypes.c_int]
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.hyb_img_decode_u8.restype = ctypes.c_int
        lib.hyb_img_decode_u8.argtypes = [
            ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int]
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
        return None
    return _LIB


def decode_gray_native(path: str) -> Optional[np.ndarray]:
    """Decode to (H, W) float32 [0,1], or None if the native decoder is
    unavailable or does not support this file (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = path.encode()
    if lib.hyb_img_probe(p, ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value), np.float32)
    if lib.hyb_img_decode(p, out, h.value, w.value) != 0:
        return None
    return out


def decode_gray_u8_native(path: str) -> Optional[np.ndarray]:
    """Decode to (H, W) uint8 raw 0-255, or None if unavailable/unsupported.

    8-bit sources stay 8-bit end-to-end: the VIO step normalizes on the
    accelerator, so the host->device transfer ships 1/4 the bytes of the
    float32 form (reference carries 8-bit frames, image.cpp:345-367)."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = path.encode()
    if lib.hyb_img_probe(p, ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value), np.uint8)
    if lib.hyb_img_decode_u8(p, out, h.value, w.value) != 0:
        return None
    return out
