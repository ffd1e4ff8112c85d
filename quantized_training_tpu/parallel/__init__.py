from .mesh import (
    batch_spec,
    make_mesh,
    param_spec,
    shard_batch,
    shard_state,
    state_shardings,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "shard_state",
    "state_shardings",
    "batch_spec",
    "param_spec",
]
