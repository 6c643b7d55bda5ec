from .quaternion import (  # noqa: F401
    quat_to_rmat, rmat_to_quat, quat_mul, quat_conj, quat_normalize,
    quat_from_two_vectors, gyro_update_matrix, quat_right_mul_matrix,
)
from .poses import (  # noqa: F401
    to_world_to_camera, to_camera_to_world, to_odometry_pose, transform_vec3, vec2matrix,
)
from .cameras import (  # noqa: F401
    Camera, build_pinhole, build_fisheye, build_camera_from_params,
    pixel_to_ray, ray_to_pixel, normalize_pixel, ray_to_pixel_jacobian, is_valid_pixel,
)
