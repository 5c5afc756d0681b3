"""Joint (token, head) top-k selection for compressed KV retention.

Per sequence, the retain budget is spent jointly over all (token, head)
pairs — heads compete, so a sequence can keep many tokens in one head and few
in another (reference: compression/common.py:171-243). Returns indices in the
`token_in_seq * H + head` form consumed by `store_prefill_topk`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from compactor_vllm_tpu.compression.compactor import NEG_INF


def topk_retain_indices(
    scores: jax.Array,  # [T, H] (+inf protected, -inf padding)
    seq_starts: jax.Array,  # [Bp] packed row offset per sequence
    seq_lens: jax.Array,  # [Bp]
    retain: jax.Array,  # [Bp] per-sequence (token, head) budget
    max_q: int,
    k_static: int,
):
    """Returns (topk_idx [Bp, K], topk_valid [Bp, K]).

    The per-sequence score rows are assembled with a gather from the packed
    layout (scatters are several ms on TPU; gathers are cheap), then one
    `top_k` over the joint (token, head) axis spends the budget.
    """
    T, H = scores.shape
    Bp = seq_starts.shape[0]
    qpos = jnp.arange(max_q, dtype=jnp.int32)[None, :]
    rows = jnp.clip(seq_starts[:, None] + qpos, 0, T - 1)  # [Bp, max_q]
    in_seq = qpos < seq_lens[:, None]
    padded = jnp.where(
        in_seq[:, :, None], scores[rows].astype(jnp.float32), NEG_INF
    )  # [Bp, max_q, H]
    flat = padded.reshape(Bp, max_q * H)
    k_eff = min(k_static, max_q * H)
    _, idx = jax.lax.top_k(flat, k_eff)  # [Bp, K] sorted by score desc
    kpos = jnp.arange(k_eff, dtype=jnp.int32)[None, :]
    budget = jnp.minimum(retain, seq_lens * H)
    valid = kpos < budget[:, None]
    # Never select a padding pair even if the budget over-runs real entries.
    valid &= (idx // H) < seq_lens[:, None]
    return idx.astype(jnp.int32), valid
