from pdc_tpu.pipeline.change_detection import (
    ChangeDetection,
    compute_foreground_mask_from_depth_image_pair,
)
from pdc_tpu.pipeline.renderer import render_depth_from_points
