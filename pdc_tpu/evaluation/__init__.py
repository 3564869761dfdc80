from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation
from pdc_tpu.evaluation.plotting import (
    DenseCorrespondenceEvaluationPlotter,
    normalize_descriptor,
    normalize_descriptor_pair,
)
