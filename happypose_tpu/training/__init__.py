"""Training: losses, optimizers, data-parallel train step, checkpointing."""

from happypose_tpu.training.losses import (
    loss_refiner_CO_disentangled_reference_point,
    coarse_classification_loss,
)
from happypose_tpu.training.trainer import (
    TrainState,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "loss_refiner_CO_disentangled_reference_point",
    "coarse_classification_loss",
    "TrainState",
    "make_optimizer",
    "make_train_step",
]
