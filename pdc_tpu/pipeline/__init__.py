from pdc_tpu.pipeline.change_detection import (
    ChangeDetection,
    compute_foreground_mask_from_depth_image_pair,
)
from pdc_tpu.pipeline.renderer import render_depth_from_points
from pdc_tpu.pipeline.segmentation import (
    euclidean_cluster,
    fit_plane_ransac,
    icp_point_to_point,
    remove_radius_outliers,
    segment_table,
    voxel_down_sample,
)
