from .losses import (
    DEFAULT_LOSS_WEIGHTS,
    masked_l1,
    step_autoencoder,
    weighted_total,
)
from .loop import (
    TrainState,
    jit_train_step,
    make_optimizer,
    make_train_step,
    train,
    train_patch_norm,
)

__all__ = [
    "DEFAULT_LOSS_WEIGHTS",
    "masked_l1",
    "step_autoencoder",
    "weighted_total",
    "TrainState",
    "jit_train_step",
    "make_optimizer",
    "make_train_step",
    "train",
    "train_patch_norm",
]
