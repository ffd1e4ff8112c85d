from .checkpoint import (
    checkpoint_name,
    load_checkpoint,
    materialize,
    restore_sharded,
    save_checkpoint,
)
from .train import LRSchedule, clip_by_global_norm, global_norm, print_model_stats

__all__ = [
    "LRSchedule",
    "global_norm",
    "clip_by_global_norm",
    "print_model_stats",
    "save_checkpoint",
    "load_checkpoint",
    "checkpoint_name",
    "materialize",
    "restore_sharded",
]
