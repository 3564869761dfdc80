from pdc_tpu.ops.sampling import sample_from_mask, sample_uniform_pixels
from pdc_tpu.ops.correspondence import (
    find_pixel_correspondences,
    create_non_correspondences,
    make_blind_non_matches,
)
from pdc_tpu.ops.matching import (
    best_match_for_descriptor,
    best_matches_batch,
    norm_diffs_for_descriptor,
    gaussian_heatmap_from_norm_diffs,
)
