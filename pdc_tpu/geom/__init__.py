from pdc_tpu.geom.camera import (
    CameraIntrinsics,
    project_to_image,
    unproject_to_camera,
)
from pdc_tpu.geom.transforms import (
    invert_se3,
    pose_angle,
    pose_distance,
    quaternion_from_matrix,
    quaternion_matrix,
    se3_from_dict,
    transform_points,
)
