from pdc_tpu.losses.pixelwise_contrastive import (
    LossConfig,
    match_loss,
    non_match_descriptor_loss,
    non_match_loss_descriptor_only,
    non_match_loss_with_l2_pixel_norm,
    triplet_loss,
)
from pdc_tpu.losses.composer import (
    MATCH_TYPE_DIFFERENT_OBJECT,
    MATCH_TYPE_EMPTY,
    MATCH_TYPE_MULTI_OBJECT,
    MATCH_TYPE_SINGLE_OBJECT_ACROSS_SCENE,
    MATCH_TYPE_SINGLE_OBJECT_WITHIN_SCENE,
    MATCH_TYPE_SYNTHETIC_MULTI_OBJECT,
    compose_loss,
)
