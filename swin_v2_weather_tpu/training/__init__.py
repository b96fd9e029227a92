from swin_v2_weather_tpu.training.optim import (
    CosineAnnealingLR,
    ReduceLROnPlateau,
    build_optimizer,
    build_scheduler,
    set_learning_rate,
)
from swin_v2_weather_tpu.training.step import TrainState, build_eval_step, build_train_step
from swin_v2_weather_tpu.training.checkpoint import (
    latest_checkpoint_exists,
    restore_checkpoint,
    save_checkpoint,
)
from swin_v2_weather_tpu.training.trainer import Trainer

__all__ = [
    "build_optimizer",
    "build_scheduler",
    "set_learning_rate",
    "CosineAnnealingLR",
    "ReduceLROnPlateau",
    "TrainState",
    "build_train_step",
    "build_eval_step",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint_exists",
    "Trainer",
]
