from neuralsvd_tpu.training.optimizers import (
    torch_rmsprop,
    build_optimizer,
    warmup_cosine_schedule,
)
from neuralsvd_tpu.training.train_state import TrainState, ema_update
from neuralsvd_tpu.training.train_operator import make_train_step, train_operator

__all__ = [
    "torch_rmsprop",
    "build_optimizer",
    "warmup_cosine_schedule",
    "TrainState",
    "ema_update",
    "make_train_step",
    "train_operator",
]
