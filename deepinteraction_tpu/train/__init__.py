from .schedules import cyclic_cosine
from .step import (
    TrainState,
    bev_shape,
    create_train_state,
    frozen_paths,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "cyclic_cosine",
    "TrainState",
    "bev_shape",
    "create_train_state",
    "frozen_paths",
    "make_optimizer",
    "make_train_step",
]
