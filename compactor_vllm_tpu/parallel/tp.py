"""Tensor-parallel collective helpers used inside shard_map'ed steps.

These are the TPU-native equivalents of the reference's NCCL calls:
- `psum_partial`  <- dist.all_reduce in RowParallelLinear / MoE down
  (reference: layers/linear.py:149-153, layers/moe.py:92-103)
- `vocab_parallel_embed` <- VocabParallelEmbedding mask + all_reduce
  (reference: layers/embed_head.py:34-42)
- `gather_logits` <- ParallelLMHead TP gather; unlike the reference (gather
  to rank 0, peers get None, embed_head.py:61-68), every device gets the full
  logits so SPMD sampling needs no token broadcast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psum_partial(x: jax.Array, axis: str | None) -> jax.Array:
    return jax.lax.psum(x, axis) if axis else x


def vocab_parallel_embed(
    table: jax.Array, ids: jax.Array, axis: str | None, scale=None,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """table is the vocab-row shard [V_local, Hd]; ids are global token ids.
    `scale` [V_local, 1] dequantizes an int8 table (layers/quant.py) into
    `dtype` (the model compute dtype)."""

    def deq(x, s):
        if scale is None:
            return x
        return x.astype(dtype) * s.astype(dtype)

    if not axis:
        return deq(table[ids], None if scale is None else scale[ids])
    v_local = table.shape[0]
    lo = jax.lax.axis_index(axis) * v_local
    local = ids - lo
    ok = (local >= 0) & (local < v_local)
    idx = jnp.clip(local, 0, v_local - 1)
    x = deq(table[idx], None if scale is None else scale[idx])
    x = jnp.where(ok[..., None], x, 0)
    return jax.lax.psum(x, axis)


def gather_logits(local_logits: jax.Array, axis: str | None) -> jax.Array:
    """[N, V_local] vocab-shard logits -> [N, V] full logits on every device."""
    if not axis:
        return local_logits
    return jax.lax.all_gather(local_logits, axis, axis=1, tiled=True)
