"""Mixture-of-experts block (Qwen3-MoE style).

TPU-native replacement for the reference's vendored Triton outer-gather-
scatter grouped GEMM + fused routing (triton_kernels/matmul_ogs.py:299,
routing.py:395; wired in models/qwen3_moe.py:143-184): tokens are stable-
sorted by expert, expert GEMMs run as `jax.lax.ragged_dot` (XLA's grouped
matmul, MXU-tiled), and outputs are combined with a weighted scatter-add.
Capacity-free: every routed (token, expert) pair is computed.

Under tensor parallelism the experts are sharded over the `tp` axis
(expert parallelism — the real version of the reference's single-device
`simulated_ep`, triton_kernels/routing.py:395-419): the router runs
replicated, each device computes only the (token, expert) pairs whose expert
it owns, and the weighted combine is a `psum`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from compactor_vllm_tpu.layers.ops import silu_and_mul
from compactor_vllm_tpu.parallel.tp import psum_partial


def moe_block(spec, lp: dict, x: jax.Array, tp_axis: str | None = None) -> jax.Array:
    """`spec` is the per-device shard: spec.num_experts is LOCAL when tp_axis
    is set; the router table lp["router"] [Hd, E_global] stays replicated."""
    N, Hd = x.shape
    E_local, K = spec.num_experts, spec.num_experts_per_tok
    logits = x.astype(jnp.float32) @ lp["router"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(probs, K)  # [N, K] global expert ids
    if spec.norm_topk_prob:
        topv = topv / jnp.maximum(topv.sum(-1, keepdims=True), 1e-20)

    flat_expert = topi.reshape(-1).astype(jnp.int32)  # [N*K]
    flat_token = (jnp.arange(N * K, dtype=jnp.int32)) // K
    if tp_axis:
        lo = jax.lax.axis_index(tp_axis) * E_local
        local = flat_expert - lo
        mine = (local >= 0) & (local < E_local)
        # Foreign pairs sort to the end (expert id E_local) and are zero-weighted.
        flat_expert = jnp.where(mine, local, E_local)
    order = jnp.argsort(flat_expert, stable=True)
    sorted_expert = flat_expert[order]
    sorted_token = flat_token[order]
    group_sizes = jnp.bincount(sorted_expert, length=E_local)

    xs = x[sorted_token]  # [N*K, Hd]; rows past the local groups are unused
    h = jax.lax.ragged_dot(xs, lp["gate_up_proj"], group_sizes)
    h = silu_and_mul(h)
    ys = jax.lax.ragged_dot(h, lp["down_proj"], group_sizes)  # [N*K, Hd]

    w = topv.reshape(-1)[order].astype(jnp.float32)
    if tp_axis:
        w = jnp.where(sorted_expert < E_local, w, 0.0)
        # Rows past the covered group prefix are unspecified under ragged_dot
        # (sum(group_sizes) < N*K when foreign pairs exist); zero them so a
        # backend that leaves them NaN cannot poison the weighted combine.
        ys = jnp.where((sorted_expert < E_local)[:, None], ys, 0.0)
    out = jnp.zeros((N, Hd), jnp.float32).at[sorted_token].add(
        ys.astype(jnp.float32) * w[:, None]
    )
    return psum_partial(out.astype(x.dtype), tp_axis)
