"""Device mesh construction for the engine.

The reference's multi-device story is NCCL tensor parallelism over spawned
worker processes (reference: core/llm_engine.py:52-70, core/model_runner.py:52-58).
The TPU-native equivalent is a `jax.sharding.Mesh` over ICI (+DCN for
multi-host) with named axes:

- "dp": data parallel — independent batch groups, each owning its own KV page
  pool and batch slots; no collectives cross this axis inside a step.
- "tp": tensor parallel — Q/KV heads, MLP channels, MoE experts, and the
  vocab are sharded here; `psum`/`all_gather` over this axis replace the
  reference's NCCL all_reduce/gather (linear.py:149-153, embed_head.py:61-68).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

AXIS_DP = "dp"
AXIS_TP = "tp"


def make_mesh(tp: int = 1, dp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. The tp axis is innermost so it maps to the
    fastest interconnect (ICI within a slice) under JAX's default device
    ordering; dp spans the remaining (possibly DCN) dimension."""
    if devices is None:
        devices = jax.devices()
    n = tp * dp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    grid = np.array(devices[:n]).reshape(dp, tp)
    return Mesh(grid, (AXIS_DP, AXIS_TP))
