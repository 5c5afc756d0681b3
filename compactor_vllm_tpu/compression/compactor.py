"""Compactor: training-free, query-agnostic KV compression scoring.

Implements the approximate-leverage-score pipeline of
"Compactor: Calibrated Query-Agnostic KV Cache Compression with Approximate
Leverage Scores" (arXiv:2507.08143), matching the reference numerics
(compression/compactor.py:113-335, 356-599) with a TPU-native formulation:

- pre-RoPE: sketch keys with a shared random PHI [D, s], chunk the sequence
  (static chunk scatter, see chunking.py), mean-center per chunk, form the
  s x s Gram per (chunk, head), ridge-regularize, and take scores as the row
  norms of U = X V S^{-1/2}. The reference runs cuSOLVER gesvda on the PSD
  Gram with a QR fallback (compactor.py:177-221); on TPU a batched `eigh` of
  the same PSD matrix is cheaper, stabler, and mathematically identical.
- post-RoPE: per-128-chunk non-causal attention column mass with sm_scale=1.0
  (compactor.py:356-487), z-scored per sequence, blended 0.5 * pre + post,
  protected head/tail token ranges forced to +inf (compactor.py:586-598).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from compactor_vllm_tpu.compression.chunking import (
    ChunkMeta,
    chunk_row_mask,
    gather_from_chunks,
    make_chunk_meta,
    make_chunk_meta_aligned,
    scatter_to_chunks,
    segment_zscore,
    static_num_chunks,
    zscore_aligned,
)

POSTROPE_CHUNK = 128  # reference: CompactorCompression.chunk_size = 128
PRE_POST_BLEND = 0.5  # reference: accum_blending=0.5 (compactor.py:58)
RIDGE = 5e-3  # reference default regularizer (compactor.py:117)
NEG_INF = -1.0e30
POS_INF = 1.0e30


def make_phi(head_dim: int, sketch_size: int, seed: int = 42) -> jax.Array:
    """Shared random sketch matrix; seeded identically on every host so SPMD
    programs agree (reference: utils/arguments.py:81-86, seed 42)."""
    key = jax.random.PRNGKey(seed)
    return jax.random.normal(key, (head_dim, sketch_size), dtype=jnp.float32) / (
        sketch_size**0.5
    )


def approximate_leverage_scores(
    k: jax.Array,  # [T, H, D] pre-RoPE keys
    phi: jax.Array,  # [D, s]
    meta: ChunkMeta,
    chunk_size: int,
    regularizer: float = RIDGE,
    aligned: bool = False,
    token_valid: jax.Array | None = None,  # [T]; required when aligned
) -> jax.Array:  # [T, H] z-scored per chunk
    T, H, D = k.shape
    s = phi.shape[1]
    X = jnp.einsum(
        "thd,ds->ths", k.astype(jnp.float32), phi, preferred_element_type=jnp.float32
    )
    Xc = scatter_to_chunks(X, meta, chunk_size, aligned)  # [NC, C, H, s]
    row_mask = chunk_row_mask(meta, chunk_size)  # [NC, C]
    # Zero invalid rows first: the aligned (reshape) path keeps padding-row
    # values, which may be NaN garbage from unwritten kernel output rows.
    Xc = jnp.where(row_mask[:, :, None, None], Xc, 0.0)
    cnt = jnp.maximum(meta.chunk_valid_count.astype(jnp.float32), 1.0)[
        :, None, None
    ]  # [NC,1,1]
    mean = Xc.sum(axis=1) / cnt  # [NC, H, s]
    Xc = jnp.where(row_mask[:, :, None, None], Xc - mean[:, None], 0.0)

    G = jnp.einsum("nchs,ncht->nhst", Xc, Xc, preferred_element_type=jnp.float32)
    G = G + regularizer * jnp.eye(s, dtype=jnp.float32)
    # Leverage scores are diag(X (G + lambda I)^-1 X^T). The reference SVDs the
    # PSD Gram (gesvda, compactor.py:177); on TPU a batched Cholesky solve is
    # the same quantity (U = X V S^-1/2 => ||U_i||^2 = x_i^T M^-1 x_i) at a
    # fraction of the cost — XLA's eigh is an iterative QR loop (~40ms for
    # these shapes on v5e), Cholesky is direct.
    Lc = jnp.linalg.cholesky(G)  # [NC, H, s, s]
    # Solve L Y = X^T per (chunk, head): Y = L^-1 X^T, scores = colnorms(Y)^2.
    Xt = jnp.einsum("nchs->nhsc", Xc)
    Y = jax.lax.linalg.triangular_solve(
        Lc, Xt, left_side=True, lower=True
    )  # [NC, H, s, C]
    sc = jnp.maximum(jnp.einsum("nhsc->nch", Y * Y), 0.0)  # [NC, C, H]

    scores = gather_from_chunks(sc, meta, aligned)  # [T, H]
    # Per-chunk z-score over (tokens x heads), matching the reference epilogue
    # that normalizes over each scoring chunk (compactor.py:215-221 grid).
    # (In aligned packing every row has a chunk id, so padding must be
    # excluded via token_valid; in the scatter path gcid==NC marks it.)
    if aligned:
        return zscore_aligned(scores, None, token_valid, chunk_size, "chunk")
    valid = token_valid if token_valid is not None else meta.gcid < meta.num_chunks
    return segment_zscore(scores, meta.gcid, valid, meta.num_chunks)


def chunk_colmass(
    q: jax.Array,  # [T, HQ, D] post-RoPE
    k: jax.Array,  # [T, H, D] post-RoPE
    meta: ChunkMeta,  # built with POSTROPE_CHUNK
    chunk_size: int = POSTROPE_CHUNK,
    sm_scale: float = 1.0,
    aligned: bool = False,
) -> jax.Array:  # [T, H] raw column mass
    """Column attention mass of each key within its chunk, non-causal — the
    jnp oracle for the fused in-kernel scoring (paged_prefill_attention with
    score_chunks=True computes the identical quantity for free off the key
    tiles it already streams).

    Padded query rows contribute a uniform 1/chunk_size to every key so that
    shorter chunks preserve total attention mass (reference quirk at
    compactor.py:447-452, `p = where(q_mask, p, INVERSE_CHUNK)`).
    """
    T, HQ, D = q.shape
    H = k.shape[1]
    G = HQ // H
    qc = scatter_to_chunks(q.reshape(T, H, G, D), meta, chunk_size, aligned)
    kc = scatter_to_chunks(k, meta, chunk_size, aligned)  # [NC, C, H, D]
    row_mask = chunk_row_mask(meta, chunk_size)  # [NC, C]

    logits = jnp.einsum(
        "nqhgd,nkhd->nhgqk",
        qc.astype(jnp.float32),
        kc.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * sm_scale  # [NC, H, G, C_q, C_k]
    kmask = row_mask[:, None, None, None, :]
    qmask = row_mask[:, None, None, :, None]
    logits = jnp.where(kmask & qmask, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - jnp.maximum(m, NEG_INF / 2))
    p = p / jnp.maximum(p.sum(axis=-1, keepdims=True), 1e-30)
    # Invalid query rows redistribute uniform mass over valid keys.
    p = jnp.where(qmask, p, 1.0 / chunk_size)
    p = jnp.where(kmask, p, 0.0)
    colmass = p.sum(axis=(2, 3))  # [NC, H, C_k]
    return gather_from_chunks(
        jnp.einsum("nhk->nkh", colmass), meta, aligned
    )  # [T, H]


def non_causal_chunk_attention_scores(
    q: jax.Array,  # [T, HQ, D] post-RoPE
    k: jax.Array,  # [T, H, D] post-RoPE
    meta: ChunkMeta,  # built with POSTROPE_CHUNK
    token_seq_idx: jax.Array,  # [T]
    token_valid: jax.Array,  # [T]
    num_seqs: int,
    chunk_size: int = POSTROPE_CHUNK,
    sm_scale: float = 1.0,
    aligned: bool = False,
) -> jax.Array:  # [T, H] z-scored per sequence
    scores = chunk_colmass(q, k, meta, chunk_size, sm_scale, aligned)
    if aligned:
        return zscore_aligned(
            scores, token_seq_idx, token_valid, chunk_size, "seq",
            num_seqs=num_seqs,
        )
    return segment_zscore(scores, token_seq_idx, token_valid, num_seqs)


def compactor_scores(
    q_postrope: jax.Array,  # [T, HQ, D]
    k_prerope: jax.Array,  # [T, H, D]
    k_postrope: jax.Array,  # [T, H, D]
    phi: jax.Array,  # [D, s]
    seq_lens: jax.Array,  # [Bp]
    token_seq_idx: jax.Array,
    token_in_pos: jax.Array,
    token_valid: jax.Array,
    protected_first: jax.Array,  # [Bp]
    protected_last: jax.Array,  # [Bp]
    score_chunk_size: int,  # 512 default; == t_pad when chunking disabled
    t_pad: int,
    b_pad: int,
    aligned: bool = False,  # sequence starts are chunk-aligned in the packing
    postrope_colmass: jax.Array | None = None,  # [T, H] from the fused kernel
) -> jax.Array:
    """Full Compactor scoring pipeline -> [T, H] selection scores.

    When `postrope_colmass` is given (computed for free inside the Pallas
    prefill attention kernel), the dense postrope chunk attention is skipped
    and only the per-sequence z-score is applied to it.
    """
    if aligned:
        meta_pre = make_chunk_meta_aligned(
            token_seq_idx, token_valid, score_chunk_size
        )
    else:
        nc_pre = static_num_chunks(t_pad, b_pad, score_chunk_size)
        meta_pre = make_chunk_meta(
            seq_lens, token_seq_idx, token_in_pos, token_valid,
            score_chunk_size, nc_pre,
        )
    pre = approximate_leverage_scores(
        k_prerope, phi, meta_pre, score_chunk_size,
        aligned=aligned, token_valid=token_valid,
    )
    if postrope_colmass is not None:
        # Rows never written by the kernel (padding past every sequence)
        # hold garbage, possibly NaN — zero them before the z-score (NaN
        # survives multiplication by a 0 mask, not a select).
        postrope_colmass = jnp.where(
            token_valid[:, None], postrope_colmass, 0.0
        )
        if aligned:
            post = zscore_aligned(
                postrope_colmass, token_seq_idx, token_valid, POSTROPE_CHUNK,
                "seq", num_seqs=seq_lens.shape[0],
            )
        else:
            post = segment_zscore(
                postrope_colmass, token_seq_idx, token_valid, seq_lens.shape[0]
            )
    else:
        if aligned:
            meta_post = make_chunk_meta_aligned(
                token_seq_idx, token_valid, POSTROPE_CHUNK
            )
        else:
            nc_post = static_num_chunks(t_pad, b_pad, POSTROPE_CHUNK)
            meta_post = make_chunk_meta(
                seq_lens, token_seq_idx, token_in_pos, token_valid,
                POSTROPE_CHUNK, nc_post,
            )
        post = non_causal_chunk_attention_scores(
            q_postrope,
            k_postrope,
            meta_post,
            token_seq_idx,
            token_valid,
            num_seqs=seq_lens.shape[0],
            aligned=aligned,
        )
    scores = post + PRE_POST_BLEND * pre
    return apply_protection(
        scores, seq_lens, token_seq_idx, token_in_pos, token_valid,
        protected_first, protected_last,
    )


def apply_protection(
    scores: jax.Array,  # [T, H]
    seq_lens: jax.Array,  # [Bp]
    token_seq_idx: jax.Array,
    token_in_pos: jax.Array,
    token_valid: jax.Array,
    protected_first: jax.Array,  # [Bp]
    protected_last: jax.Array,  # [Bp]
) -> jax.Array:
    """Protected head/tail ranges are never evicted (+inf); padding -> -inf
    (reference: compactor.py:591-598)."""
    lens = seq_lens
    first = protected_first[token_seq_idx]
    last = protected_last[token_seq_idx]
    L = lens[token_seq_idx]
    protected = (token_in_pos < first) | (token_in_pos >= L - last)
    scores = jnp.where(protected[:, None], POS_INF, scores)
    return jnp.where(token_valid[:, None], scores, NEG_INF)
