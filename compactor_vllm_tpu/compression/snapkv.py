"""SnapKV: query-aware KV compression scoring over the recent window.

Matches the reference semantics (compression/snapkv.py:12-448): the last
`window` tokens' queries attend (softmax-normalized) over all *non-window*
keys; per-key scores are the probability mass summed over those window query
rows, causal-band average-pooled (kernel 5), z-scored per sequence over the
non-window region, and window keys are forced to +inf so they always survive
(snapkv.py:267-276). Incompatible with chunked scoring by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from compactor_vllm_tpu.compression.compactor import NEG_INF, POS_INF, apply_protection
from compactor_vllm_tpu.ops.attention_ref import unpack_varlen

WINDOW = 32  # reference: snapkv.py:33 (w=32)
KPOOL = 5  # reference: snapkv.py:430


def snapkv_scores(
    q_postrope: jax.Array,  # [T, HQ, D]
    k_postrope: jax.Array,  # [T, H, D]
    seq_starts: jax.Array,  # [Bp]
    seq_lens: jax.Array,  # [Bp]
    token_seq_idx: jax.Array,
    token_in_pos: jax.Array,
    token_valid: jax.Array,
    protected_first: jax.Array,
    protected_last: jax.Array,
    max_q: int,
    window: int = WINDOW,
    kpool: int = KPOOL,
) -> jax.Array:  # [T, H]
    T, HQ, D = q_postrope.shape
    H = k_postrope.shape[1]
    G = HQ // H
    Bp = seq_lens.shape[0]
    sm_scale = 1.0 / (D**0.5)

    lens = seq_lens
    win = jnp.minimum(jnp.asarray(window, lens.dtype), lens)  # [Bp]
    eff_len = lens - win  # non-window keys per sequence

    # Window queries: the last `win[b]` tokens of each sequence, right-aligned
    # into a fixed [Bp, window] block (rows past win[b] are masked out).
    wpos = jnp.arange(window, dtype=jnp.int32)[None, :]  # [1, W]
    widx = (seq_starts + lens)[:, None] - win[:, None] + wpos  # [Bp, W]
    wvalid = wpos < win[:, None]
    widx = jnp.where(wvalid, widx, 0)
    qw = q_postrope[widx]  # [Bp, W, HQ, D]
    qw = qw.reshape(Bp, window, H, G, D)

    kb, kmask = unpack_varlen(k_postrope, seq_starts, seq_lens, max_q)  # [Bp, max_q, H, D]
    kpos = jnp.arange(max_q, dtype=jnp.int32)  # [max_q]
    eff_mask = kmask & (kpos[None, :] < eff_len[:, None])  # non-window keys only

    logits = jnp.einsum(
        "bwhgd,bkhd->bhwgk",
        qw.astype(jnp.float32),
        kb.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * sm_scale  # [Bp, H, W, G, max_q]
    row_ok = wvalid[:, None, :, None, None]  # [Bp,1,W,1,1]
    col_ok = eff_mask[:, None, None, None, :]  # [Bp,1,1,1,max_q]
    logits = jnp.where(row_ok & col_ok, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - jnp.maximum(m, NEG_INF / 2))
    denom = jnp.maximum(p.sum(axis=-1, keepdims=True), 1e-30)
    p = jnp.where(row_ok, p / denom, 0.0)
    scores = p.sum(axis=(2, 3))  # [Bp, H, max_q]
    scores = jnp.where(eff_mask[:, None, :], scores, 0.0)

    if kpool > 1:
        # Causal average pool along keys: pooled[i] = mean(s[i-kpool+1 .. i]),
        # clamped at the sequence start (reference band pool, snapkv.py:253-263).
        cs = jnp.cumsum(scores, axis=-1)
        shifted = jnp.pad(cs, ((0, 0), (0, 0), (kpool, 0)))[:, :, :max_q]
        window_sum = cs - shifted
        denom_pool = jnp.minimum(kpos + 1, kpool).astype(jnp.float32)[None, None, :]
        scores = window_sum / denom_pool
        scores = jnp.where(eff_mask[:, None, :], scores, 0.0)

    # Z-score per sequence over non-window (token, head) pairs
    # (reference: _zscore_per_batch_epilogue, snapkv.py:284-329).
    nf = eff_mask[:, None, :].astype(jnp.float32)
    cnt = jnp.maximum(nf.sum(axis=(1, 2)) * H, 1.0)  # heads share stats
    sums = (scores * nf).sum(axis=(1, 2))
    sqs = (scores * scores * nf).sum(axis=(1, 2))
    mean = sums / cnt
    var = jnp.maximum(sqs / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + 1e-12)
    scores = (scores - mean[:, None, None]) * inv[:, None, None]

    # Window keys always retained.
    in_window = kmask & (kpos[None, :] >= eff_len[:, None])
    scores = jnp.where(in_window[:, None, :], POS_INF, scores)
    scores = jnp.where(kmask[:, None, :], scores, NEG_INF)

    # Pack [Bp, H, max_q] back to [T, H].
    packed = scores.transpose(0, 2, 1)[token_seq_idx, token_in_pos]  # [T, H]
    return apply_protection(
        packed, seq_lens, token_seq_idx, token_in_pos, token_valid,
        protected_first, protected_last,
    )
