from .schedule import warmup_cosine
from .optim import OptimConfig, build_optimizer, optimizer_labels
from .train import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from .checkpoint import (
    save_checkpoint,
    load_checkpoint,
    save_trainable,
    CheckpointManager,
)

__all__ = [
    "warmup_cosine",
    "OptimConfig",
    "build_optimizer",
    "optimizer_labels",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "save_checkpoint",
    "load_checkpoint",
    "save_trainable",
    "CheckpointManager",
]
