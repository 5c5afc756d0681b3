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
    token_seq_idx: jax.Array,  # [T]
    token_in_pos: jax.Array,  # [T]
    token_valid: jax.Array,  # [T]
    retain: jax.Array,  # [Bp] per-sequence (token, head) budget
    num_seqs: int,
    max_q: int,
    k_static: int,
):
    """Returns (topk_idx [Bp, K], topk_valid [Bp, K])."""
    T, H = scores.shape
    # Unpack to [Bp, max_q, H] padded with -inf.
    padded = jnp.full((num_seqs + 1, max_q, H), NEG_INF, jnp.float32)
    sid = jnp.where(token_valid, token_seq_idx, num_seqs)
    padded = padded.at[sid, jnp.where(token_valid, token_in_pos, 0)].set(
        scores.astype(jnp.float32), mode="drop"
    )
    flat = padded[:num_seqs].reshape(num_seqs, max_q * H)
    k_eff = min(k_static, max_q * H)
    _, idx = jax.lax.top_k(flat, k_eff)  # [Bp, K] sorted by score desc
    kpos = jnp.arange(k_eff, dtype=jnp.int32)[None, :]
    lens = jnp.zeros(num_seqs, jnp.int32).at[sid].add(
        jnp.where(token_valid, 1, 0), mode="drop"
    )
    budget = jnp.minimum(retain, lens * H)
    valid = kpos < budget[:, None]
    # Never select a padding pair even if the budget over-runs real entries.
    valid &= (idx // H) < lens[:, None]
    return idx.astype(jnp.int32), valid
