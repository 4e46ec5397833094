from .checkpoint import load_checkpoint, restore_into, save_checkpoint
from .evaluate import test
from .steps import TrainState, create_train_state, make_eval_step, make_train_step
from .trainer import ModelBundle, Trainer

__all__ = [
    "Trainer", "ModelBundle", "test", "TrainState", "create_train_state",
    "make_train_step", "make_eval_step", "save_checkpoint",
    "load_checkpoint", "restore_into",
]
