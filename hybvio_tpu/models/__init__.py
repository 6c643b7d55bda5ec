"""Model-family presets: the benchmark configurations as factory functions.

The reference's "models" are its benchmark configurations (BASELINE.json):
mono VIO, stereo VIO, full VISLAM, fisheye/rolling-shutter, and the batched
offline multi-sequence mode. Each preset returns (Parameters, DerivedParameters,
cameras) ready for odometry.vio.make_vio / parallel.batched.make_batched_vio.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..config import DerivedParameters, Parameters
from ..geometry.cameras import build_camera_from_params


def _finalize(p: Parameters, width: int, height: int, dtype=None):
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    derived = DerivedParameters.from_parameters(p)
    cams = [build_camera_from_params(p.tracker, width, height, dtype=dtype)]
    if p.tracker.useStereo:
        cams.append(build_camera_from_params(p.tracker, width, height, second=True, dtype=dtype))
    return p, derived, tuple(cams)


def euroc_mono(width: int = 752, height: int = 480, **overrides):
    """Monocular VIO, EuRoC-like intrinsics (BASELINE config 1)."""
    p = Parameters()
    p.tracker.focalLength = 458.0
    p.tracker.principalPointX = width / 2
    p.tracker.principalPointY = height / 2
    p.odometry.visualR = 0.3
    for k, v in overrides.items():
        g, n = k.split(".")
        p.set_parameter(g, n, v)
    return _finalize(p, width, height)


def euroc_stereo(width: int = 752, height: int = 480, baseline: float = 0.11,
                 **overrides):
    """Stereo VIO (-useStereo; BASELINE config 2)."""
    p = Parameters()
    p.tracker.useStereo = True
    p.tracker.focalLength = 458.0
    p.tracker.principalPointX = width / 2
    p.tracker.principalPointY = height / 2
    p.odometry.stereoCameraTranslation = (-baseline, 0.0, 0.0)
    p.odometry.visualR = 0.3
    for k, v in overrides.items():
        g, n = k.split(".")
        p.set_parameter(g, n, v)
    return _finalize(p, width, height)


def vislam(width: int = 752, height: int = 480, **overrides):
    """Full VISLAM (-useSlam; BASELINE config 3)."""
    p, derived, cams = euroc_mono(width, height, **overrides)
    p.slam.useSlam = True
    return p, derived, cams


def tumvi_fisheye(width: int = 512, height: int = 512, **overrides):
    """Fisheye KB4 (TUM-VI-style; BASELINE config 4)."""
    p = Parameters()
    p.tracker.fisheyeCamera = True
    p.tracker.validCameraFov = 150.0
    p.tracker.focalLength = 190.0
    p.tracker.principalPointX = width / 2
    p.tracker.principalPointY = height / 2
    p.tracker.distortionCoeffs = (0.0035, 0.0007, -0.002, 0.0002)
    p.odometry.visualR = 0.4
    for k, v in overrides.items():
        g, n = k.split(".")
        p.set_parameter(g, n, v)
    return _finalize(p, width, height)
