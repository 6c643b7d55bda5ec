"""Derived (non-generated) parameters: the 4x4 extrinsic matrices.

Mirrors the reference's Parameters struct members that are computed from the
flat parameter vectors at startup (reference: src/tracker/util.cpp:95-110,
codegen/parameters_base.hpp:24-26).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from .params_generated import Parameters


@dataclasses.dataclass
class DerivedParameters:
    imu_to_camera: np.ndarray  # (4,4)
    second_imu_to_camera: np.ndarray  # (4,4)
    imu_to_output: np.ndarray  # (4,4)

    @staticmethod
    def from_parameters(p: Parameters) -> "DerivedParameters":
        from ..geometry.poses import vec2matrix

        imu_to_camera = np.asarray(vec2matrix(p.odometry.imuToCameraMatrix))
        if len(p.odometry.secondImuToCameraMatrix) > 1:
            second = np.asarray(vec2matrix(p.odometry.secondImuToCameraMatrix))
        else:
            second = imu_to_camera.copy()
        if len(p.odometry.secondImuToCameraMatrix) < 16:
            second[:3, 3] += np.asarray(p.odometry.stereoCameraTranslation, dtype=np.float64)
        imu_to_output = imu_to_camera if p.odometry.outputCameraPose else np.eye(4)
        return DerivedParameters(imu_to_camera, second, imu_to_output)
