from .state import (  # noqa: F401
    POS, VEL, ORI, BGA, BAA, BAT, SFT, CAM, INER_DIM, POSE_DIM, MAP_POINT_DIM,
    Q_ACC, Q_GYRO, Q_BGA_DRIFT, Q_BAA_DRIFT, Q_DIM,
    EKFState, init_state, state_dim, trail_pose_slice, map_point_offset, process_noise_q,
)
from .predict import make_predict, predict_mean_and_jacobians, process_noise_diag  # noqa: F401
from .update import (  # noqa: F401
    kf_update, normalize_quaternions, update_zupt, update_zupt_initialization,
    update_zrupt, update_pseudo_velocity, update_position, update_zero_height,
    update_orientation, visual_track_update, visual_track_gate, VisualUpdateResult,
)
from .augment import augment_pose, undo_augmentation  # noqa: F401
from .transforms import (  # noqa: F401
    initialize_orientation, translate_to, transform_to, condition_on_last_pose,
    lock_biases, insert_map_point,
)
from .chi2 import CHI2INV95  # noqa: F401
