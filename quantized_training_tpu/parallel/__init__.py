from .collectives import benchmark_collectives
from .fsdp import bitnet_fsdp_linear, bitnet_fsdp_params
from .tp import kv_cache_spec, shard_kv_cache, shard_params_tp, tp_param_spec
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
    "bitnet_fsdp_linear",
    "bitnet_fsdp_params",
    "benchmark_collectives",
    "tp_param_spec",
    "shard_params_tp",
    "kv_cache_spec",
    "shard_kv_cache",
]
