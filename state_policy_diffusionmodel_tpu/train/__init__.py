from . import checkpoints
from .loop import TrainConfig, Trainer, make_eval_step, make_optimizer, make_train_step
from .lr_schedule import ReduceLROnPlateau, should_early_stop
from .sample_viz import make_sample_hook

__all__ = [
    "checkpoints", "TrainConfig", "Trainer", "make_optimizer",
    "make_train_step", "make_eval_step", "ReduceLROnPlateau",
    "should_early_stop", "make_sample_hook",
]
