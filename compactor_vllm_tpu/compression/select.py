"""Joint (token, head) retention selection for compressed KV storage.

Per sequence, the retain budget is spent jointly over all (token, head)
pairs — heads compete, so a sequence can keep many tokens in one head and few
in another (reference: compression/common.py:171-243).

Selection is THRESHOLD-based rather than `lax.top_k`-based: the K-th largest
score is found by exact 32-step bit bisection over the monotone uint32
encoding of the f32 scores, ties are broken deterministically in flat
token-major order (identical tie order to `lax.top_k` over the [T, H]
flattened axis), and the per-head retained sets fall out as masks + in-head
token-order ranks. This replaces an O(N log N) top_k + a second per-head
sort (the two ordered the same data twice — round-2 ledger: ~3 ms/layer)
with a handful of comparison/cumsum passes, and makes per-head refinements
(the opt-in retention cap, pad-to-page top-up) a second cheap bisection
instead of extra sorts.

Pad-to-page (reference kv_cache/store_kv_cache.py:178-248): each head's
retained count is rounded UP to a page multiple by admitting its next-ranked
tokens — the last page is allocated either way, so the extra tokens are free
capacity. The padded count never exceeds the sequence length, so it always
fits the (prompt + max_new) reservation held during prefill.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from compactor_vllm_tpu.compression.compactor import NEG_INF


class Selection(NamedTuple):
    """Retained-set description consumed by the compressed stores."""

    # [T, H] i32: 0-based rank of the token within its (sequence, head)
    # retained stream, in ASCENDING TOKEN ORDER; -1 for unselected pairs.
    # (Within-head storage order is a permutation of the reference's
    # score-ordered slots; attention is permutation-invariant over keys.)
    rank: jax.Array
    # [Bp, H] i32 retained token count per (sequence, head).
    counts: jax.Array


def _sortable_keys(scores: jax.Array) -> jax.Array:
    """Monotone f32 -> uint32 key map: key order == value order (+inf
    protected scores map highest, NEG_INF padding lowest). -0.0 is
    canonicalized to +0.0 so float-equal values share one key (a `+ 0.0`
    would be folded away by XLA's algebraic simplifier under jit)."""
    s = scores.astype(jnp.float32)
    s = jnp.where(s == 0.0, jnp.float32(0.0), s)
    bits = jax.lax.bitcast_convert_type(s, jnp.uint32)
    return jnp.where(
        (bits >> 31) == 1, ~bits, bits | jnp.uint32(0x80000000)
    )


def _bisect_threshold(count_ge, target, shape):
    """Largest uint32 tau (per element of `shape`) with count_ge(tau) >=
    target, built bit-by-bit from the MSB (exact; no overflow games)."""
    tau = jnp.zeros(shape, jnp.uint32)

    def body(i, tau):
        bit = jnp.uint32(1) << (31 - i).astype(jnp.uint32)
        cand = tau | bit
        ok = count_ge(cand) >= target
        return jnp.where(ok, cand, tau)

    return jax.lax.fori_loop(0, 32, body, tau, unroll=4)


def _excl_cumsum_rows(x: jax.Array) -> jax.Array:
    """Exclusive cumsum along axis 0 (token axis)."""
    c = jnp.cumsum(x.astype(jnp.int32), axis=0)
    return c - x.astype(jnp.int32)


def threshold_select(
    scores: jax.Array,  # [T, H] (+inf protected, NEG_INF padding)
    seq_starts: jax.Array,  # [Bp] packed row offset per sequence
    seq_lens: jax.Array,  # [Bp]
    retain: jax.Array,  # [Bp] per-sequence joint (token, head) budget
    *,
    head_cap: jax.Array | None = None,  # [Bp] per-head cap (0 = uncapped)
    pad_to_page: int = 0,  # page size to round per-head counts up to (0=off)
) -> Selection:
    T, H = scores.shape
    Bp = seq_starts.shape[0]
    key = _sortable_keys(scores)  # [T, H]

    t_ids = jnp.arange(T, dtype=jnp.int32)[None, :]  # [1, T]
    starts = seq_starts[:, None].astype(jnp.int32)
    lens = seq_lens[:, None].astype(jnp.int32)
    mask_bt = (t_ids >= starts) & (t_ids < starts + lens)  # [Bp, T]
    in_seq = jnp.any(mask_bt, axis=0)  # [T]
    # seq_of[t]: owning sequence (0 for out-of-seq tokens — they are masked
    # out of every count and never selected).
    seq_of = jnp.argmax(mask_bt, axis=0).astype(jnp.int32)  # [T]
    mask_f = mask_bt.astype(jnp.float32)

    # ---- 1. joint per-sequence threshold: K-th largest over (token, head)
    budget = jnp.minimum(retain.astype(jnp.int32), seq_lens * H)

    def count_ge_joint(tau):  # tau [Bp] -> counts [Bp]
        tok_tau = tau[seq_of][:, None]  # [T, 1]
        c_t = jnp.sum((key >= tok_tau), axis=1).astype(jnp.float32) * in_seq
        return (mask_f @ c_t).astype(jnp.int32)

    tau = _bisect_threshold(count_ge_joint, budget, (Bp,))
    tok_tau = tau[seq_of][:, None]  # [T, 1]
    gt = (key > tok_tau) & in_seq[:, None]  # [T, H]
    eq = (key == tok_tau) & in_seq[:, None]
    n_gt = (mask_f @ jnp.sum(gt, axis=1).astype(jnp.float32)).astype(jnp.int32)
    quota = budget - n_gt  # [Bp] ties to admit, flat token-major order
    # Flat token-major tie rank within each sequence (matches lax.top_k's
    # lowest-flat-index-first tie order over the [max_q, H] flattening).
    eq_flat = eq.reshape(T * H)
    csum = jnp.cumsum(eq_flat.astype(jnp.int32)) - eq_flat.astype(jnp.int32)
    tie_rank = csum.reshape(T, H)
    tie_base = csum[jnp.clip(seq_starts * H, 0, T * H - 1)]  # [Bp]
    tie_ok = (tie_rank - tie_base[seq_of][:, None]) < quota[seq_of][:, None]
    sel = gt | (eq & tie_ok)

    counts0 = (mask_f @ sel.astype(jnp.float32)).astype(jnp.int32)  # [Bp, H]

    # ---- 2. optional per-head refinement: retention cap and/or page top-up
    target = counts0
    if head_cap is not None:
        cap = jnp.where(head_cap > 0, head_cap, jnp.int32(2**31 - 1))
        target = jnp.minimum(target, cap[:, None])
    if pad_to_page:
        P = pad_to_page
        target = jnp.minimum(-(-target // P) * P, lens)
    if head_cap is not None or pad_to_page:
        def count_ge_head(tau_bh):  # [Bp, H] -> [Bp, H]
            tok_tau = tau_bh[seq_of]  # [T, H]
            c_th = ((key >= tok_tau) & in_seq[:, None]).astype(jnp.float32)
            return (mask_f @ c_th).astype(jnp.int32)

        tau_h = _bisect_threshold(count_ge_head, target, (Bp, H))
        tok_tau_h = tau_h[seq_of]  # [T, H]
        gt = (key > tok_tau_h) & in_seq[:, None]
        eq = (key == tok_tau_h) & in_seq[:, None]
        n_gt_h = (mask_f @ gt.astype(jnp.float32)).astype(jnp.int32)
        quota_h = target - n_gt_h  # [Bp, H]
        # Per-(sequence, head) tie rank in token order — the restriction of
        # the flat token-major order to one head IS token order, so the kept
        # set matches the joint pass exactly on unrefined heads.
        tie_rank_h = _excl_cumsum_rows(eq)
        tie_base_h = jnp.take_along_axis(
            jnp.concatenate([jnp.zeros((1, H), jnp.int32),
                             jnp.cumsum(eq.astype(jnp.int32), axis=0)]),
            jnp.clip(seq_starts, 0, T)[:, None], axis=0,
        )  # [Bp, H] cumsum value at each sequence start
        tie_ok = (tie_rank_h - tie_base_h[seq_of]) < quota_h[seq_of]
        sel = gt | (eq & tie_ok)

    # ---- 3. in-head token-order ranks + final counts
    rank_all = _excl_cumsum_rows(sel)  # [T, H] cumulative over the packed axis
    base = jnp.take_along_axis(
        jnp.concatenate([jnp.zeros((1, H), jnp.int32),
                         jnp.cumsum(sel.astype(jnp.int32), axis=0)]),
        jnp.clip(seq_starts, 0, T)[:, None], axis=0,
    )  # [Bp, H]
    rank = jnp.where(sel, rank_all - base[seq_of], -1).astype(jnp.int32)
    counts = (mask_f @ sel.astype(jnp.float32)).astype(jnp.int32)
    return Selection(rank=rank, counts=counts)


def topk_retain_indices(
    scores: jax.Array,  # [T, H] (+inf protected, -inf padding)
    seq_starts: jax.Array,  # [Bp] packed row offset per sequence
    seq_lens: jax.Array,  # [Bp]
    retain: jax.Array,  # [Bp] per-sequence (token, head) budget
    max_q: int,
    k_static: int,
):
    """Legacy lax.top_k selection, kept as an oracle for tests/benchmarks.

    Returns (topk_idx [Bp, K], topk_valid [Bp, K]) with idx in the
    `token_in_seq * H + head` form.
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
