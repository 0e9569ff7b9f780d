from .losses import (
    DEFAULT_LOSS_WEIGHTS,
    masked_l1,
    step_autoencoder,
    weighted_total,
)
from .checkpoint import has_train_state, load_train_state, save_train_state
from .loop import (
    TrainState,
    jit_train_step,
    make_optimizer,
    make_train_step,
    train,
    train_patch_norm,
)

__all__ = [
    "has_train_state",
    "load_train_state",
    "save_train_state",
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
