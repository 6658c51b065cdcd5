from tracking_sdf_tpu.core.lie import (
    so3_hat,
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    Pose,
    pose_identity,
    pose_inverse,
    pose_compose,
    pose_apply,
)
from tracking_sdf_tpu.core.camera import PinholeCamera, tum_fr1_camera, ros_default_camera
