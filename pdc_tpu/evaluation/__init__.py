from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation
from pdc_tpu.evaluation.keypoints import (
    evaluate_network_cross_scene_keypoints,
    keypoint_statistics,
    run_cross_instance_keypoint_evaluation_on_network,
)
from pdc_tpu.evaluation.plotting import (
    DenseCorrespondenceEvaluationPlotter,
    normalize_descriptor,
    normalize_descriptor_pair,
)
from pdc_tpu.evaluation.qualitative import (
    evaluate_network_qualitative,
    make_2d_cluster_plot,
    plot_descriptor_colormaps,
    single_image_pair_qualitative_analysis,
)
