from frn_tpu.train.checkpoint import CheckpointManager
from frn_tpu.train.loop import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)
from frn_tpu.train.plateau import ReduceLROnPlateau
from frn_tpu.train.trainer import Trainer

__all__ = [
    "CheckpointManager",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "set_learning_rate",
    "ReduceLROnPlateau",
    "Trainer",
]
