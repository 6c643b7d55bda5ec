"""hybvio_tpu: TPU-native visual-inertial odometry / VISLAM framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
SpectacularAI/HybVIO (WACV 2022): EKF-based VIO with trailing-pose state
augmentation and a hybrid EKF-SLAM map, a sparse image front-end (pyramids,
GFTT corners, pyramidal Lucas-Kanade, pinhole/fisheye cameras, RANSAC), IMU /
camera sample synchronization, and an optional SLAM module (keyframes, local
BA, loop closure).

Layout:
  config/    parameter surface (generated from the reference's definitions) + loaders
  geometry/  quaternions, poses, camera models
  ekf/       the extended Kalman filter core
  odometry/  triangulation, visual updates, trail bookkeeping, backend step
  frontend/  image pipeline: pyramid, detection, optical flow, RANSAC
  ops/       Pallas TPU kernels for the hot image ops
  parallel/  device-mesh / batched multi-sequence execution
  io/        dataset readers/writers, synthetic data
  api/       public VIO API (add_gyro/add_acc/add_frame -> outputs)
  slam/      SLAM backend (keyframes, BA, loop closure)
"""

__version__ = "0.1.0"

from .config.params_generated import Parameters  # noqa: F401
