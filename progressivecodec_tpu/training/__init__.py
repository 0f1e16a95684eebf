from progressivecodec_tpu.training.loss import (
    scalable_rate_distortion_loss,
    rate_distortion_loss,
)
from progressivecodec_tpu.training.optim import make_optimizer, PlateauState
from progressivecodec_tpu.training.step import TrainState, make_train_step, make_eval_step

__all__ = [
    "scalable_rate_distortion_loss",
    "rate_distortion_loss",
    "make_optimizer",
    "PlateauState",
    "TrainState",
    "make_train_step",
    "make_eval_step",
]
