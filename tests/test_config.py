"""Config system tests (reference: test/parameter_parser.cpp semantics)."""
import numpy as np
import pytest

from hybvio_tpu.config import (
    Parameters, DerivedParameters, load_parameters, set_key_value,
    apply_parameters_text, apply_argv,
)
from hybvio_tpu.config.loader import UnknownParameterError


def test_defaults_match_reference():
    p = Parameters()
    # spot checks against reference codegen/parameter_definitions.c defaults
    assert p.odometry.cameraTrailLength == 20
    assert p.odometry.hybridMapSize == 0
    assert p.odometry.noiseScale == 100.0
    assert p.odometry.maxVisualUpdates == 20
    assert p.odometry.maxSuccessfulVisualUpdates == 5
    assert p.tracker.maxTracks == 200
    assert p.tracker.maxTrackLength == 21
    assert p.tracker.pyrLKWindowSize == 31
    assert p.tracker.ransacMaxIters == 75
    assert p.slam.keyframeCandidateInterval == 8
    assert p.odometry.trackSampling == "GAP"
    assert p.odometry.gravity == 9.819


def test_parameters_text():
    p = Parameters()
    apply_parameters_text(p, "useSlam true;\ncameraTrailLength 8; tracker.maxTracks 70")
    assert p.slam.useSlam is True
    assert p.odometry.cameraTrailLength == 8
    assert p.tracker.maxTracks == 70


def test_unknown_key_raises():
    p = Parameters()
    with pytest.raises(UnknownParameterError):
        set_key_value(p, "noSuchParameter", 1)


def test_argv():
    p = Parameters()
    rest = apply_argv(p, ["-useStereo", "-maxVisualUpdates=11", "-i=/data/foo", "-gfttMinDistance=12.5"])
    assert p.tracker.useStereo is True
    assert p.odometry.maxVisualUpdates == 11
    assert p.tracker.gfttMinDistance == 12.5
    assert rest == ["-i=/data/foo"]


def test_vector_param():
    p = Parameters()
    set_key_value(p, "odometry.imuToCameraMatrix", "0,1,0,-1,0,0,0,0,1")
    assert p.odometry.imuToCameraMatrix == (0.0, 1.0, 0.0, -1.0, 0.0, 0.0, 0.0, 0.0, 1.0)


def test_derived_extrinsics():
    p = Parameters()
    d = DerivedParameters.from_parameters(p)
    # default imuToCameraMatrix is diag-ish 3x3 column major (1,0,0,0,-1,0,0,0,-1)
    np.testing.assert_allclose(d.imu_to_camera[:3, :3], np.diag([1.0, -1.0, -1.0]))
    # second camera = first + stereo translation by default
    np.testing.assert_allclose(
        d.second_imu_to_camera[:3, 3] - d.imu_to_camera[:3, 3],
        np.array(p.odometry.stereoCameraTranslation),
    )


def test_calibration_json():
    calib = '''{"cameras": [
      {"focalLengthX": 458.0, "focalLengthY": 457.0, "principalPointX": 367.0,
       "principalPointY": 248.0, "distortionCoefficients": [-0.28, 0.07, 0.0],
       "imuToCameraMatrix": [[0,1,0,0],[-1,0,0,0],[0,0,1,0],[0,0,0,1]]},
      {"focalLengthX": 460.0, "focalLengthY": 459.0, "principalPointX": 370.0,
       "principalPointY": 250.0}
    ]}'''
    p = load_parameters(calibration_json=calib)
    assert p.tracker.focalLengthX == 458.0
    assert p.tracker.secondFocalLengthX == 460.0
    assert p.tracker.distortionCoeffs == (-0.28, 0.07, 0.0)
    d = DerivedParameters.from_parameters(p)
    np.testing.assert_allclose(d.imu_to_camera[0, 1], 1.0)


def test_precedence_argv_wins():
    p = load_parameters(
        parameters_txt="cameraTrailLength 10",
        argv=["-cameraTrailLength=6"],
    )
    assert p.odometry.cameraTrailLength == 6


def test_video_rotation_param():
    """videoRotation rotates the imuToCamera xy block, cumulating like the
    reference (parameters_base.cpp:38-66)."""
    import numpy as np

    from hybvio_tpu.config import Parameters
    from hybvio_tpu.config.loader import set_key_value
    from hybvio_tpu.geometry.poses import vec2matrix

    p = Parameters()
    base = np.eye(4)
    base[:3, 3] = [0.1, 0.2, 0.3]
    p.odometry.imuToCameraMatrix = tuple(base.T.flatten())
    set_key_value(p, "videoRotation", "CW90")
    m = np.asarray(vec2matrix(p.odometry.imuToCameraMatrix))
    np.testing.assert_allclose(m[:2, :2], [[0, 1], [-1, 0]], atol=1e-12)
    np.testing.assert_allclose(m[:3, 3], [0.1, 0.2, 0.3])  # translation kept
    assert p.videoRotationSteps == 1
    # cumulates: CW90 twice = CW180
    set_key_value(p, "videoRotation", "CW90")
    m = np.asarray(vec2matrix(p.odometry.imuToCameraMatrix))
    np.testing.assert_allclose(m[:2, :2], [[-1, 0], [0, -1]], atol=1e-12)
    assert p.videoRotationSteps == 2
