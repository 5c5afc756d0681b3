"""SnapKV: query-aware KV compression scoring over the recent window.

Matches the reference semantics (compression/snapkv.py:12-448): the last
`window` tokens' queries attend (softmax-normalized) over all *non-window*
keys; per-key scores are the probability mass summed over those window query
rows, causal-band average-pooled (kernel 5), z-scored per sequence over the
non-window region, and window keys are forced to +inf so they always survive
(snapkv.py:267-276). Incompatible with chunked scoring by construction.

Long-context design: the reference streams the key axis inside a Triton
kernel with an online LSE (snapkv.py:52-157). Here the same streaming runs as
a two-pass `lax.scan` over key blocks — pass 1 accumulates each window
query's (max, denominator), pass 2 emits per-block column mass — so peak
memory is O(window * G * KEY_BLOCK) per block instead of a dense
[H, W, G, T] logit tensor (hundreds of MB at 32K, GB at 128K). The QK logits
are computed twice, but the window is 32 rows: the FLOPs are negligible next
to prefill attention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from compactor_vllm_tpu.compression.compactor import NEG_INF, POS_INF, apply_protection

WINDOW = 32  # reference: snapkv.py:33 (w=32)
KPOOL = 5  # reference: snapkv.py:430
KEY_BLOCK = 1024  # streaming block along the key axis


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
    key_block: int = KEY_BLOCK,
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
    widx = jnp.where(wvalid, jnp.clip(widx, 0, T - 1), 0)
    qw = q_postrope[widx].astype(jnp.float32)  # [Bp, W, HQ, D]
    qw = qw.reshape(Bp, window, H, G, D)
    row_ok = wvalid[:, None, :, None]  # [Bp, 1, W, 1]

    KB = min(key_block, max_q)
    NB = -(-max_q // KB)
    kpos_blk = jnp.arange(KB, dtype=jnp.int32)  # [KB]

    def block_logits(i):
        """QK logits of one key block: [Bp, H, W, G, KB] + key mask [Bp, KB]."""
        pos = i * KB + kpos_blk  # sequence-relative key positions
        rows = jnp.clip(seq_starts[:, None] + pos[None, :], 0, T - 1)
        kb = k_postrope[rows].astype(jnp.float32)  # [Bp, KB, H, D]
        ok = pos[None, :] < eff_len[:, None]  # non-window keys only
        s = jnp.einsum(
            "bwhgd,bkhd->bhwgk", qw, kb, preferred_element_type=jnp.float32
        ) * sm_scale
        s = jnp.where(
            row_ok[..., None] & ok[:, None, None, None, :], s, NEG_INF
        )
        return s, ok

    # Pass 1: per-query-row (max, denominator) via online LSE over blocks
    # (reference streams this in-kernel, snapkv.py:52-157).
    def lse_body(carry, i):
        m, l = carry
        s, _ = block_logits(i)
        mb = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m, mb)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.exp(s - m_new[..., None]).sum(axis=-1)
        return (m_new, l), None

    m0 = jnp.full((Bp, H, window, G), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Bp, H, window, G), jnp.float32)
    (m_f, l_f), _ = jax.lax.scan(
        lse_body, (m0, l0), jnp.arange(NB, dtype=jnp.int32)
    )
    m_f = jnp.maximum(m_f, NEG_INF / 2)
    inv_l = jnp.where(l_f > 0, 1.0 / jnp.maximum(l_f, 1e-30), 0.0)
    inv_l = jnp.where(row_ok, inv_l, 0.0)

    # Pass 2: per-block column mass summed over window query rows.
    def mass_body(out, i):
        s, ok = block_logits(i)
        p = jnp.exp(s - m_f[..., None]) * inv_l[..., None]
        colmass = p.sum(axis=(2, 3))  # [Bp, H, KB]
        colmass = jnp.where(ok[:, None, :], colmass, 0.0)
        out = jax.lax.dynamic_update_slice(out, colmass, (0, 0, i * KB))
        return out, None

    scores0 = jnp.zeros((Bp, H, NB * KB), jnp.float32)
    scores, _ = jax.lax.scan(
        mass_body, scores0, jnp.arange(NB, dtype=jnp.int32)
    )
    scores = scores[:, :, :max_q]
    kpos = jnp.arange(max_q, dtype=jnp.int32)
    kmask = kpos[None, :] < lens[:, None]
    eff_mask = kpos[None, :] < eff_len[:, None]

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
