from compactor_vllm_tpu.parallel import multihost
from compactor_vllm_tpu.parallel.mesh import AXIS_DP, AXIS_TP, make_mesh
from compactor_vllm_tpu.parallel.sharding import (
    cache_pspecs,
    local_spec,
    param_pspecs,
    shard_blocked_params,
    shard_params,
)

__all__ = [
    "AXIS_DP",
    "AXIS_TP",
    "make_mesh",
    "multihost",
    "cache_pspecs",
    "local_spec",
    "param_pspecs",
    "shard_blocked_params",
    "shard_params",
]
