"""Training subsystem: losses, optimizers, schedules, train step/loop,
checkpointing."""

from .losses import loss_function_builder
from .optimizer import (
    optimizer_builder,
    schedule_builder,
    deep_supervision_schedule_builder,
)
from .train_state import TrainState, create_train_state
from .train_step import build_train_step, build_eval_step
