from reflecting_reality_tpu.training.checkpoint import (
    latest_checkpoint, load_state, prune_checkpoints, save_state,
)
from reflecting_reality_tpu.training.ema import ema_update
from reflecting_reality_tpu.training.lr_schedules import get_schedule
from reflecting_reality_tpu.training.train_step import (
    TrainConfig, TrainState, make_optimizer, make_train_step,
)

__all__ = [
    "TrainConfig", "TrainState", "ema_update", "get_schedule",
    "latest_checkpoint", "load_state", "make_optimizer", "make_train_step",
    "prune_checkpoints", "save_state",
]
