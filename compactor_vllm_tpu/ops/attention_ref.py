"""Pure-jnp reference attention over the paged, head-sparse KV cache.

This is the permanent numeric oracle (replacing the reference repo's use of
flash-attn as test oracle, tests/test_triton_attention.py:271-283) and the
always-available `AttentionBackend.REFERENCE` execution path. It materializes
the paged cache densely through the page table, so it is exact but memory
hungry — fine for tests, CPU runs, and small contexts.

Semantics mirror the reference kernels:
- prefill: packed varlen queries attend causally over
  [cached prefix (per-head ragged) ‖ appended new K/V]
  (reference: attention/sparse_varlen_kernel.py:11-197);
- decode: one query token per slot attends over the full per-head cache
  (reference: attention/sparse_decode_kernel.py:10-165).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from compactor_vllm_tpu.kv_cache.state import KVCacheGeometry, KVCacheState

NEG_INF = -1.0e30


def gather_cache_dense(
    geom: KVCacheGeometry,
    state: KVCacheState,
    layer,
    slots: jax.Array,  # [Bp]
    max_len: int,
    pt_l: jax.Array | None = None,  # [Bp, H, maxp] pre-sliced rows
    lens_l: jax.Array | None = None,  # [Bp, H]
):
    """Materialize cache slices [Bp, H, max_len, D] via page-table gather."""
    if pt_l is None:
        pt_full = jax.lax.dynamic_index_in_dim(state.page_table, layer, 0, keepdims=False)
        pt_l = pt_full[slots]
    if lens_l is None:
        lens_full = jax.lax.dynamic_index_in_dim(state.bh_lens, layer, 0, keepdims=False)
        lens_l = lens_full[slots]
    lens = lens_l  # [Bp, H]
    H = geom.num_kv_heads
    pos = jnp.arange(max_len, dtype=jnp.int32)  # [max_len]
    page_col = pos // geom.page_size
    offset = pos % geom.page_size
    heads = jnp.arange(H, dtype=jnp.int32)
    page_id = pt_l[jnp.arange(pt_l.shape[0])[:, None, None], heads[None, :, None], page_col[None, None, :]]
    base = layer * geom.rows_per_layer
    rows = base + page_id * geom.page_size + offset[None, None, :]
    valid = pos[None, None, :] < lens[:, :, None]
    rows = jnp.where(valid, rows, geom.num_rows)  # trash page is zero-initialized
    kv = state.kv_pages[rows]  # [Bp, H, max_len, 2D] — one gather for both
    D = geom.head_dim
    return kv[..., :D], kv[..., D:], lens


def unpack_varlen(
    x: jax.Array,  # [T, H, D] packed
    seq_starts: jax.Array,  # [Bp] packed row offset per sequence
    seq_lens: jax.Array,  # [Bp]
    max_q: int,
):
    """Unpack packed-varlen rows into [Bp, max_q, H, D] plus a validity mask.

    Sequence b occupies packed rows [seq_starts[b], seq_starts[b] + seq_lens[b]);
    starts may be tile-aligned with gaps between sequences (the Pallas-kernel
    packing contract), which dense `cu_seqlens` could not express.
    """
    qpos = jnp.arange(max_q, dtype=jnp.int32)[None, :]  # [1, max_q]
    idx = seq_starts[:, None] + qpos  # [Bp, max_q]
    mask = qpos < seq_lens[:, None]
    idx = jnp.where(mask, idx, 0)
    return x[idx], mask  # [Bp, max_q, H, D], [Bp, max_q]


def pack_varlen(
    x: jax.Array,  # [Bp, max_q, H, D]
    seq_starts: jax.Array,
    seq_lens: jax.Array,
    total: int,
):
    """Inverse of unpack_varlen: scatter rows back into packed layout."""
    Bp, max_q = x.shape[0], x.shape[1]
    qpos = jnp.arange(max_q, dtype=jnp.int32)[None, :]
    idx = seq_starts[:, None] + qpos
    idx = jnp.where(qpos < seq_lens[:, None], idx, total)  # OOB rows dropped
    out = jnp.zeros((total,) + x.shape[2:], x.dtype)
    return out.at[idx.reshape(-1)].set(
        x.reshape((Bp * max_q,) + x.shape[2:]), mode="drop"
    )


def _mixed_attention(
    q,  # [Bp, max_q, HQ, D]
    k_cache,  # [Bp, H, max_c, D]
    v_cache,
    cache_lens,  # [Bp, H]
    k_new,  # [Bp, max_q, H, D]
    v_new,
    q_mask,  # [Bp, max_q]
    sm_scale: float,
):
    """Dense attention over [cached ‖ new] with causal masking on the new part."""
    Bp, max_q, HQ, D = q.shape
    H = k_new.shape[2]
    G = HQ // H
    qf = q.astype(jnp.float32).reshape(Bp, max_q, H, G, D)
    qf = jnp.einsum("bqhgd->bhgqd", qf)

    # Cached phase: no causal mask, per-head ragged length.
    sc = jnp.einsum(
        "bhgqd,bhkd->bhgqk", qf, k_cache.astype(jnp.float32)
    ) * sm_scale
    max_c = k_cache.shape[2]
    cmask = jnp.arange(max_c)[None, None, :] < cache_lens[:, :, None]  # [Bp,H,max_c]
    sc = jnp.where(cmask[:, :, None, None, :], sc, NEG_INF)

    # New phase: causal within the appended tokens.
    kn = jnp.einsum("bqhd->bhqd", k_new.astype(jnp.float32))
    sn = jnp.einsum("bhgqd,bhkd->bhgqk", qf, kn) * sm_scale
    qi = jnp.arange(max_q)
    causal = qi[:, None] >= qi[None, :]  # [max_q, max_q]
    nmask = causal[None, None, None] & q_mask[:, None, None, None, :]
    sn = jnp.where(nmask, sn, NEG_INF)

    s = jnp.concatenate([sc, sn], axis=-1)  # [Bp, H, G, max_q, max_c+max_q]
    p = jax.nn.softmax(s, axis=-1)
    vals = jnp.concatenate(
        [v_cache.astype(jnp.float32), jnp.einsum("bqhd->bhqd", v_new.astype(jnp.float32))],
        axis=2,
    )
    o = jnp.einsum("bhgqk,bhkd->bhgqd", p, vals)
    o = jnp.einsum("bhgqd->bqhgd", o).reshape(Bp, max_q, HQ, D)
    return jnp.where(q_mask[:, :, None, None], o, 0.0).astype(q.dtype)


def ref_prefill_attention(
    geom: KVCacheGeometry,
    state: KVCacheState,
    layer,
    q: jax.Array,  # [T, HQ, D] packed varlen
    k_new: jax.Array,  # [T, H, D]
    v_new: jax.Array,
    seq_starts: jax.Array,  # [Bp]
    seq_lens: jax.Array,  # [Bp]
    slots: jax.Array,  # [Bp]
    max_q: int,
    max_cache_len: int,
    sm_scale: float,
    cached_lens: jax.Array | None = None,  # [Bp, H] pre-store snapshot
) -> jax.Array:
    """Oracle varlen prefill attention over [paged cache ‖ new tokens].

    `cached_lens` overrides the cache's bh_lens (chunked prefill stores the
    chunk before attending; the snapshot keeps the cached phase bounded to
    the previous chunks)."""
    T = q.shape[0]
    if max_cache_len > 0:
        k_c, v_c, lens = gather_cache_dense(
            geom, state, layer, slots, max_cache_len, lens_l=cached_lens
        )
    else:
        Bp = slots.shape[0]
        H, D = k_new.shape[1], k_new.shape[2]
        k_c = jnp.zeros((Bp, H, 0, D), k_new.dtype)
        v_c = jnp.zeros((Bp, H, 0, D), v_new.dtype)
        lens = jnp.zeros((Bp, H), jnp.int32)
    qb, q_mask = unpack_varlen(q, seq_starts, seq_lens, max_q)
    kb, _ = unpack_varlen(k_new, seq_starts, seq_lens, max_q)
    vb, _ = unpack_varlen(v_new, seq_starts, seq_lens, max_q)
    ob = _mixed_attention(qb, k_c, v_c, lens, kb, vb, q_mask, sm_scale)
    return pack_varlen(ob, seq_starts, seq_lens, T)


def ref_decode_attention(
    geom: KVCacheGeometry,
    state: KVCacheState,
    layer,
    q: jax.Array,  # [Bd, HQ, D] one token per slot
    slots: jax.Array,  # [Bd]
    max_cache_len: int,
    sm_scale: float,
    k_new: jax.Array | None = None,  # [Bd, H, D] this step's key (self)
    v_new: jax.Array | None = None,
    pt_l: jax.Array | None = None,
    lens_l: jax.Array | None = None,
    win_kv: jax.Array | None = None,  # [Bd, H, W, 2D] unflushed loop window
    win_cnt: jax.Array | None = None,  # [Bd] valid window entries
) -> jax.Array:
    """Oracle decode attention over the cached per-head prefix plus (when
    given) the step's own K/V merged in-register — the cache append is
    deferred and batched (see store_decode_all_layers) — plus the optional
    deferred-append loop window (flush_decode_window)."""
    Bd, HQ, D = q.shape
    k_c, v_c, lens = gather_cache_dense(
        geom, state, layer, slots, max_cache_len, pt_l, lens_l
    )
    H = k_c.shape[1]
    G = HQ // H
    qf = q.astype(jnp.float32).reshape(Bd, H, G, D)
    s = jnp.einsum("bhgd,bhkd->bhgk", qf, k_c.astype(jnp.float32)) * sm_scale
    mask = jnp.arange(max_cache_len)[None, None, :] < lens[:, :, None]
    s = jnp.where(mask[:, :, None, :], s, NEG_INF)
    v_all = v_c.astype(jnp.float32)
    if win_kv is not None:
        W = win_kv.shape[2]
        k_w = win_kv[..., :D].astype(jnp.float32)
        v_w = win_kv[..., D:].astype(jnp.float32)
        s_w = jnp.einsum("bhgd,bhwd->bhgw", qf, k_w) * sm_scale
        wmask = jnp.arange(W)[None, :] < win_cnt[:, None]  # [Bd, W]
        s_w = jnp.where(wmask[:, None, None, :], s_w, NEG_INF)
        v_w = jnp.where(wmask[:, None, :, None], v_w, 0.0)
        s = jnp.concatenate([s, s_w], axis=-1)
        v_all = jnp.concatenate([v_all, v_w], axis=2)
    if k_new is not None:
        s_self = jnp.einsum(
            "bhgd,bhd->bhg", qf, k_new.astype(jnp.float32)
        )[..., None] * sm_scale
        s = jnp.concatenate([s, s_self], axis=-1)
        v_all = jnp.concatenate([v_all, v_new.astype(jnp.float32)[:, :, None]], axis=2)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgk,bhkd->bhgd", p, v_all)
    return o.reshape(Bd, HQ, D).astype(q.dtype)
