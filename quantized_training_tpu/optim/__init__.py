"""Optimizers (the other_optim/ analog) with a string registry replacing
the reference's ``eval()`` dotted-path dispatch (train_utils.py:29-32)."""

from .adamw import AdamWState, Optimizer, adamw, adamw_bf16_sr
from .schedule_free import (
    ScheduleFreeState,
    eval_params,
    schedule_free_adamw,
    train_params,
)
from .state8bit import OptimState8bit

_REGISTRY = {
    "adamw": adamw,
    "adamw_bf16_sr": adamw_bf16_sr,
    "schedule_free_adamw": schedule_free_adamw,
    "schedule_free_adamw_8bit": lambda **kw: schedule_free_adamw(
        state_8bit=True, **kw
    ),
}


def get_optimizer(name: str, **kwargs) -> Optimizer:
    """String-keyed optimizer constructor (no eval(), unlike
    train_utils.py:29-32)."""
    if name not in _REGISTRY:
        raise ValueError(f"unknown optimizer {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


__all__ = [
    "Optimizer",
    "AdamWState",
    "ScheduleFreeState",
    "OptimState8bit",
    "adamw",
    "adamw_bf16_sr",
    "schedule_free_adamw",
    "eval_params",
    "train_params",
    "get_optimizer",
]
