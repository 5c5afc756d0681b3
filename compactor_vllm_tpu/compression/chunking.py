"""Packed-varlen ↔ fixed-chunk scatter machinery for compression scoring.

The reference chunks each sequence on the host into ragged 512-token pieces
and loops (compression/compactor.py:62-110). Under XLA everything must be
static-shaped: we map every packed token to a global chunk id
`base[seq] + in_pos // C` where `base` is the running count of chunks over
preceding sequences. The chunk space has static size
`NC = ceil(T_pad / C) + B_pad` (each sequence adds at most one partial chunk),
so scatter/gather between packed [T, ...] and chunked [NC, C, ...] layouts is
a fixed-shape gather — no host loops, no recompilation per batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ChunkMeta(NamedTuple):
    gcid: jax.Array  # [T] global chunk id per token (invalid -> NC)
    cpos: jax.Array  # [T] position within chunk
    chunk_valid_count: jax.Array  # [NC] number of valid tokens per chunk
    chunk_seq: jax.Array  # [NC] owning sequence (invalid chunks -> Bp)
    num_chunks: int  # static NC


def static_num_chunks(
    t_pad: int, b_pad: int, chunk_size: int, aligned: bool = False
) -> int:
    if aligned:
        return t_pad // chunk_size
    return -(-t_pad // chunk_size) + b_pad


def make_chunk_meta_aligned(
    token_seq_idx: jax.Array,  # [T]
    token_valid: jax.Array,  # [T]
    chunk_size: int,
) -> ChunkMeta:
    """Chunk meta for chunk-aligned packing: every sequence starts at a
    multiple of `chunk_size` in the packed layout, so chunks are contiguous
    slices — scatter/gather between packed and chunked layouts is a reshape
    (the scatter the general path needs costs several ms per layer on TPU).
    """
    T = token_seq_idx.shape[0]
    assert T % chunk_size == 0
    NC = T // chunk_size
    rows = jnp.arange(T, dtype=jnp.int32)
    gcid = rows // chunk_size
    cpos = rows % chunk_size
    vm = token_valid.reshape(NC, chunk_size)
    count = vm.sum(axis=1).astype(jnp.int32)
    # Owning sequence: any valid token's seq id (chunks never span sequences).
    sid = jnp.where(vm, token_seq_idx.reshape(NC, chunk_size), 0)
    chunk_seq = jnp.max(sid, axis=1).astype(jnp.int32)
    return ChunkMeta(gcid, cpos, count, chunk_seq, NC)


def make_chunk_meta(
    seq_lens: jax.Array,  # [Bp]
    token_seq_idx: jax.Array,  # [T]
    token_in_pos: jax.Array,  # [T]
    token_valid: jax.Array,  # [T]
    chunk_size: int,
    num_chunks: int,
) -> ChunkMeta:
    lens = seq_lens
    nchunks = -(-lens // chunk_size)
    base = jnp.concatenate(
        [jnp.zeros(1, lens.dtype), jnp.cumsum(nchunks)[:-1]]
    )  # [Bp]
    gcid = base[token_seq_idx] + token_in_pos // chunk_size
    gcid = jnp.where(token_valid, gcid, num_chunks).astype(jnp.int32)
    cpos = (token_in_pos % chunk_size).astype(jnp.int32)

    # Per-chunk owning sequence and valid-token count.
    cid = jnp.arange(num_chunks, dtype=jnp.int32)
    # searchsorted over base: seq = rightmost b with base[b] <= cid
    chunk_seq = (
        jnp.searchsorted(base, cid, side="right").astype(jnp.int32) - 1
    )
    chunk_seq = jnp.clip(chunk_seq, 0, lens.shape[0] - 1)
    local = cid - base[chunk_seq]
    count = jnp.clip(lens[chunk_seq] - local * chunk_size, 0, chunk_size)
    total_chunks = jnp.sum(nchunks)
    live = cid < total_chunks
    chunk_seq = jnp.where(live, chunk_seq, lens.shape[0]).astype(jnp.int32)
    count = jnp.where(live, count, 0).astype(jnp.int32)
    return ChunkMeta(gcid, cpos, count, chunk_seq, num_chunks)


def scatter_to_chunks(
    x: jax.Array, meta: ChunkMeta, chunk_size: int, aligned: bool = False
) -> jax.Array:
    """[T, ...] packed -> [NC, C, ...]; invalid tokens dropped, holes zero."""
    if aligned:
        return x.reshape((meta.num_chunks, chunk_size) + x.shape[1:])
    out = jnp.zeros((meta.num_chunks, chunk_size) + x.shape[1:], x.dtype)
    return out.at[meta.gcid, meta.cpos].set(x, mode="drop")


def gather_from_chunks(
    xc: jax.Array, meta: ChunkMeta, aligned: bool = False
) -> jax.Array:
    """[NC, C, ...] -> [T, ...]; invalid tokens read zeros (drop+fill)."""
    if aligned:
        return xc.reshape((-1,) + xc.shape[2:])
    return xc.at[meta.gcid, meta.cpos].get(mode="fill", fill_value=0)


def chunk_row_mask(meta: ChunkMeta, chunk_size: int) -> jax.Array:
    """[NC, C] validity mask of chunk rows."""
    return (
        jnp.arange(chunk_size, dtype=jnp.int32)[None, :]
        < meta.chunk_valid_count[:, None]
    )


def zscore_aligned(
    scores: jax.Array,  # [T, H], T a multiple of chunk_size
    token_seq_idx: jax.Array | None,  # [T]; only needed for per="seq"
    token_valid: jax.Array,  # [T]
    chunk_size: int,
    per: str,  # "chunk" | "seq"
    num_seqs: int = 0,
    eps: float = 1e-12,
) -> jax.Array:
    """Z-score over (tokens x heads) per chunk or per sequence for
    chunk-ALIGNED packing (sequences start at chunk multiples, so chunks
    never span sequences).

    Replaces `segment_zscore`'s segment_sum on the hot path: XLA lowers
    segment_sum to a row scatter-add that serializes on TPU (~175 ns/row,
    NOTES.md); here chunk partials are plain reshape reductions and the
    chunk->sequence reduction is a tiny one-hot matmul.
    """
    T, H = scores.shape
    assert T % chunk_size == 0
    NC = T // chunk_size
    sf = scores.astype(jnp.float32)
    v = token_valid.astype(jnp.float32)[:, None]
    sv = (sf * v).reshape(NC, chunk_size * H)
    ps = sv.sum(axis=1)  # [NC]
    pq = (sf * sf * v).reshape(NC, chunk_size * H).sum(axis=1)
    pc = v.reshape(NC, chunk_size).sum(axis=1) * H

    if per == "chunk":
        cnt = jnp.maximum(pc, 1.0)
        mean = ps / cnt
        var = jnp.maximum(pq / cnt - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        out = (sf.reshape(NC, chunk_size, H) - mean[:, None, None]) * inv[:, None, None]
        return out.reshape(T, H)

    # per == "seq": chunk partials -> per-sequence stats via one-hot matmul.
    vm = token_valid.reshape(NC, chunk_size)
    sid = jnp.where(vm, token_seq_idx.reshape(NC, chunk_size), 0)
    chunk_seq = jnp.max(sid, axis=1)  # [NC] owning sequence (0 if empty)
    live = vm.any(axis=1)
    onehot = (
        (chunk_seq[:, None] == jnp.arange(num_seqs, dtype=chunk_seq.dtype)[None, :])
        & live[:, None]
    ).astype(jnp.float32)  # [NC, B]
    sums = onehot.T @ ps
    sqs = onehot.T @ pq
    cnt = jnp.maximum(onehot.T @ pc, 1.0)
    mean = sums / cnt  # [B]
    var = jnp.maximum(sqs / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return (sf - mean[token_seq_idx][:, None]) * inv[token_seq_idx][:, None]


def segment_zscore(
    scores: jax.Array,  # [T, H]
    seg_ids: jax.Array,  # [T] segment id per token (invalid -> num_segments)
    valid: jax.Array,  # [T] bool
    num_segments: int,
    eps: float = 1e-12,
) -> jax.Array:
    """Z-score over (tokens x heads) within each segment
    (reference epilogue: compression/compactor.py:224-269)."""
    H = scores.shape[1]
    sf = scores.astype(jnp.float32)
    vf = valid.astype(jnp.float32)[:, None]
    sid = jnp.where(valid, seg_ids, num_segments)
    sums = jax.ops.segment_sum(
        (sf * vf).sum(axis=1), sid, num_segments=num_segments + 1
    )
    sqs = jax.ops.segment_sum(
        (sf * sf * vf).sum(axis=1), sid, num_segments=num_segments + 1
    )
    cnt = jax.ops.segment_sum(
        jnp.full(scores.shape[0], float(H)) * vf[:, 0], sid, num_segments + 1
    )
    cnt = jnp.maximum(cnt, 1.0)
    mean = sums / cnt
    var = jnp.maximum(sqs / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return (sf - mean[sid][:, None]) * inv[sid][:, None]
