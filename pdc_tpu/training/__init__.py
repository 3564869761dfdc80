from pdc_tpu.training.train import (
    DenseCorrespondenceTraining,
    TrainState,
    create_train_state,
    make_train_step,
)
from pdc_tpu.training.schedule import make_lr_schedule
