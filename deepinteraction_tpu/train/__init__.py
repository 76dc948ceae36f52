from .schedules import cyclic_cosine
from .step import TrainState, create_train_state, make_train_step, freeze_mask

__all__ = [
    "cyclic_cosine",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "freeze_mask",
]
