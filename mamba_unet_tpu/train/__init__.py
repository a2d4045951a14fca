"""Training: optimizer/schedule builders, train state, the generic Trainer,
and method-specific step functions (fully supervised, mean teacher, UAMT,
cross teaching, ...)."""

from mamba_unet_tpu.train.optim import poly_sgd, poly_lr
from mamba_unet_tpu.train.state import TrainState, create_train_state, ema_update
from mamba_unet_tpu.train.trainer import Trainer, TrainConfig

__all__ = [
    "poly_sgd",
    "poly_lr",
    "TrainState",
    "create_train_state",
    "ema_update",
    "Trainer",
    "TrainConfig",
]
