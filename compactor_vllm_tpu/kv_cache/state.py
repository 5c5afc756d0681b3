"""Device-resident paged KV cache state and store (write) operations.

Layout
------
Pages are per-layer pools of `[page_size, head_dim]` tiles; one page holds
tokens of a single kv head, enabling head-sparse retained lengths
(reference layout: kv_cache/page_table.py:93-109). The pools are flattened to
one rows array `[L * P * page_size + page_size, D]` (lane dim = head_dim);
the trailing page is a trash target for padded lanes.

Everything in this module is SHARD-LOCAL: a tensor-parallel device owns
`num_kv_heads` local heads and its own page pool, and the global cache is the
concatenation of local pools along the rows axis (sharded over the mesh's
`tp`/`dp` axes by compactor_vllm_tpu.parallel). Ops therefore run unchanged
under `shard_map` — no shard arithmetic inside kernels.

Writes are expressed as `jnp` row scatters into the page-flattened cache
(the Pallas backend replaces them with page-granular DMA kernels).
The reference claims cache slots with `tl.atomic_add` producing a scrambled
order within each head (store_kv_cache.py:10-77); TPUs have no cheap global
atomics, so the compressed store places each selected (token, head) pair at
its deterministic in-head TOKEN-ORDER rank (compression/select.py) — same
multiset-of-tokens semantics, fully SPMD-reproducible.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KVCacheState(NamedTuple):
    """Pytree carried through jitted steps (donated for in-place updates)."""

    # [L*P*page_size + page_size, 2*D] local rows — K in lanes [0, D), V in
    # [D, 2D) (interleaved so one DMA/scatter row moves BOTH; XLA scatters
    # serialize per ROW, and the decode append scatter of L*Bd*H rows was
    # the single largest decode-step cost at split K/V). The final page is
    # the trash target.
    kv_pages: jax.Array
    # [L, B, H, max_pages_per_head] shard-local page ids.
    page_table: jax.Array
    # [L, B, H] retained token count per (layer, slot, head).
    bh_lens: jax.Array


class KVCacheGeometry(NamedTuple):
    """Shard-local cache geometry: `num_kv_heads` are the heads owned by one
    device; `num_pages` is its per-layer page pool."""

    num_layers: int
    num_pages: int
    page_size: int
    num_kv_heads: int
    head_dim: int
    num_slots: int
    max_pages_per_head: int
    # Trailing trash pages (scatter/DMA target for padded lanes). The runner
    # sets this to num_kv_heads (and rounds num_pages down to a multiple of
    # it) so total_rows is divisible by num_kv_heads * page_size — the
    # bitcast view [blocks, H, page_size, 2D] used by the decode-block
    # append (store_decode_blocks).
    trash_pages: int = 1

    @property
    def rows_per_layer(self) -> int:
        return self.num_pages * self.page_size

    @property
    def num_rows(self) -> int:
        """Valid cache rows, excluding the trash pages."""
        return self.num_layers * self.rows_per_layer

    @property
    def total_rows(self) -> int:
        """Rows including the trailing trash pages."""
        return self.num_rows + self.trash_pages * self.page_size

    @property
    def blocks_aligned(self) -> bool:
        """Whether the rows buffer admits the [NB, H, page_size, 2D] view
        required by the decode-block append path."""
        return (
            self.num_pages % self.num_kv_heads == 0
            and self.total_rows % (self.num_kv_heads * self.page_size) == 0
        )


def cast_to_cache(x: jax.Array, dtype) -> jax.Array:
    """Saturating cast to the cache dtype.

    XLA's float -> float8_e4m3fn conversion maps |x| > 448 to NaN (e4m3fn
    has no inf encoding); clamping first keeps every stored byte finite.
    The decode kernels RELY on this: they read V unmasked (rows past the
    per-head length carry probability exactly 0, and 0 x finite == 0) and
    `_upcast_tile` deliberately propagates 0x7F bytes as NaN. Without the
    clamp, one out-of-range K/V value would poison its own sequence's
    attention — and, through page recycling, other sequences' too."""
    if jnp.dtype(dtype) == jnp.dtype("float8_e4m3fn"):
        x = jnp.clip(x.astype(jnp.float32), -448.0, 448.0)
    return x.astype(dtype)


def init_kv_cache(geom: KVCacheGeometry, dtype=jnp.bfloat16) -> KVCacheState:
    return KVCacheState(
        kv_pages=jnp.zeros((geom.total_rows, 2 * geom.head_dim), dtype=dtype),
        page_table=jnp.zeros(
            (geom.num_layers, geom.num_slots, geom.num_kv_heads, geom.max_pages_per_head),
            jnp.int32,
        ),
        bh_lens=jnp.zeros(
            (geom.num_layers, geom.num_slots, geom.num_kv_heads), jnp.int32
        ),
    )


def kv_cache_hbm_bytes(geom: KVCacheGeometry, dtype=jnp.bfloat16) -> int:
    itemsize = jnp.dtype(dtype).itemsize
    kv = 2 * geom.total_rows * geom.head_dim * itemsize
    pt = (
        geom.num_layers
        * geom.num_slots
        * geom.num_kv_heads
        * geom.max_pages_per_head
        * 4
    )
    lens = geom.num_layers * geom.num_slots * geom.num_kv_heads * 4
    return kv + pt + lens


def _cache_rows(
    geom: KVCacheGeometry,
    layer,
    page_table_l: jax.Array,  # [B, H, maxp]
    slots: jax.Array,  # [...] batch-slot per element
    heads: jax.Array,  # [...] kv head per element
    positions: jax.Array,  # [...] token position within the head's stream
    valid: jax.Array,  # [...] bool
) -> jax.Array:
    """Map (slot, head, position) to flat cache row ids; invalid lanes map to
    an out-of-bounds row so `mode="drop"` scatters skip them entirely — every
    index actually written is then unique, which keeps the
    `unique_indices=True` hint honest (duplicated in-bounds targets would be
    undefined behavior)."""
    page_col = jnp.minimum(positions // geom.page_size, page_table_l.shape[-1] - 1)
    offset = positions % geom.page_size
    page_id = page_table_l[slots, heads, page_col]
    base = layer * geom.rows_per_layer
    rows = base + page_id * geom.page_size + offset
    return jnp.where(valid, rows, geom.total_rows)


def store_prefill_full(
    geom: KVCacheGeometry,
    state: KVCacheState,
    layer,
    k_new: jax.Array,  # [T, H, D] packed varlen (padded)
    v_new: jax.Array,
    token_seq_idx: jax.Array,  # [T] sequence index within batch (pad rows -> any)
    token_in_seq_pos: jax.Array,  # [T] 0-based index of token within its sequence
    token_valid: jax.Array,  # [T] bool
    slots: jax.Array,  # [Bp] batch slot per sequence
    cached_lens: jax.Array,  # [Bp, H] snapshot lens before this prefill
    seq_lens: jax.Array,  # [Bp] new token count per sequence
    seq_valid: jax.Array,  # [Bp] bool
) -> KVCacheState:
    """Uncompressed prefill store: append every new token to every head
    (reference: kv_cache/store_kv_cache.py:252-371)."""
    T, H, D = k_new.shape
    pt_l = jax.lax.dynamic_index_in_dim(state.page_table, layer, 0, keepdims=False)
    tok_slot = slots[token_seq_idx]  # [T]
    heads = jnp.arange(H, dtype=jnp.int32)[None, :]  # [1, H]
    pos = cached_lens[token_seq_idx] + token_in_seq_pos[:, None]  # [T, H]
    rows = _cache_rows(
        geom,
        layer,
        pt_l,
        tok_slot[:, None],
        jnp.broadcast_to(heads, (T, H)),
        pos,
        token_valid[:, None],
    )
    rows = rows.reshape(T * H)
    # unique_indices: every (token, head) lands on its own cache row; invalid
    # lanes carry OOB rows that mode="drop" skips, so written indices really
    # are unique. Without the hint XLA serializes the scatter.
    kv = jnp.concatenate(
        [k_new.reshape(T * H, D), v_new.reshape(T * H, D)], axis=-1
    )
    kv = cast_to_cache(kv, state.kv_pages.dtype)
    kv_pages = state.kv_pages.at[rows].set(kv, unique_indices=True, mode="drop")

    new_lens = cached_lens + jnp.where(seq_valid, seq_lens, 0)[:, None]  # [Bp, H]
    bh_lens = _update_lens(state.bh_lens, layer, slots, new_lens, seq_valid)
    return state._replace(kv_pages=kv_pages, bh_lens=bh_lens)


def store_prefill_sel(
    geom: KVCacheGeometry,
    state: KVCacheState,
    layer,
    k_new: jax.Array,  # [T, H, D] packed varlen (padded)
    v_new: jax.Array,
    sel_rank: jax.Array,  # [T, H] in-head token-order rank; -1 unselected
    counts: jax.Array,  # [Bp, H] retained per (sequence, head)
    token_seq_idx: jax.Array,  # [T] sequence index within batch
    slots: jax.Array,  # [Bp]
    cached_lens: jax.Array,  # [Bp, H] snapshot lens before this prefill
    seq_valid: jax.Array,  # [Bp]
) -> KVCacheState:
    """Compressed prefill store from a threshold Selection (select.py):
    scatter exactly the selected (token, head) pairs at their in-head
    token-order ranks (reference: kv_cache/store_kv_cache.py:81-175 — same
    multiset of retained tokens; within-head order is a permutation, and
    attention is permutation-invariant over cached keys)."""
    T, H, D = k_new.shape
    pt_l = jax.lax.dynamic_index_in_dim(state.page_table, layer, 0, keepdims=False)
    tok_slot = slots[token_seq_idx]  # [T]
    heads = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None, :], (T, H))
    valid = (sel_rank >= 0) & seq_valid[token_seq_idx][:, None]
    pos = cached_lens[token_seq_idx] + jnp.maximum(sel_rank, 0)  # [T, H]
    rows = _cache_rows(
        geom, layer, pt_l, tok_slot[:, None], heads, pos, valid
    ).reshape(T * H)
    kv = jnp.concatenate(
        [k_new.reshape(T * H, D), v_new.reshape(T * H, D)], axis=-1
    )
    kv = cast_to_cache(kv, state.kv_pages.dtype)
    # unique_indices: see store_prefill_full (invalid lanes dropped OOB).
    kv_pages = state.kv_pages.at[rows].set(kv, unique_indices=True, mode="drop")
    new_lens = cached_lens + jnp.where(seq_valid[:, None], counts, 0)
    bh_lens = _update_lens(state.bh_lens, layer, slots, new_lens, seq_valid)
    return state._replace(kv_pages=kv_pages, bh_lens=bh_lens)


def store_decode_all_layers(
    geom: KVCacheGeometry,
    state: KVCacheState,
    k_new: jax.Array,  # [L, Bd, H, D] one token per (layer, slot, head)
    v_new: jax.Array,
    slots: jax.Array,  # [Bd]
    valid: jax.Array,  # [Bd] bool
    pt: jax.Array | None = None,  # [L, Bd, H, maxp] pre-gathered rows
    cur: jax.Array | None = None,  # [L, Bd, H] pre-computed lengths
) -> KVCacheState:
    """Append one decoded token to every layer's cache in a single scatter.

    Decode attention merges the step's own K/V in-register (self-key), so the
    store is deferred out of the layer scan and batched: one scatter of
    L*Bd*H rows instead of L scatters (each XLA scatter carries fixed cost).
    `pt`/`cur` let the fused decode loop reuse its hoisted slot gathers.
    """
    L, Bd, H, D = k_new.shape
    layers = jnp.arange(L, dtype=jnp.int32)[:, None, None]  # [L, 1, 1]
    heads = jnp.arange(H, dtype=jnp.int32)[None, None, :]
    if cur is None:
        cur = state.bh_lens[:, slots]  # [L, Bd, H] per-layer lengths differ
    if pt is None:
        pt = state.page_table[:, slots]  # [L, Bd, H, maxp]
    page_col = jnp.minimum(cur // geom.page_size, pt.shape[-1] - 1)
    page_id = jnp.take_along_axis(pt, page_col[..., None], axis=3)[..., 0]
    rows = layers * geom.rows_per_layer + page_id * geom.page_size + (
        cur % geom.page_size
    )
    rows = jnp.where(valid[None, :, None], rows, geom.total_rows).reshape(-1)
    # unique_indices: see store_prefill_full (invalid lanes dropped OOB).
    # One scatter of [2D]-wide rows for K and V together: XLA scatter cost is
    # per ROW, so fusing halves the dominant decode-append cost.
    kv = jnp.concatenate(
        [k_new.reshape(-1, D), v_new.reshape(-1, D)], axis=-1
    )
    kv = cast_to_cache(kv, state.kv_pages.dtype)
    kv_pages = state.kv_pages.at[rows].set(kv, unique_indices=True, mode="drop")
    new_lens = cur + valid[None, :, None].astype(cur.dtype)
    B = state.bh_lens.shape[1]
    safe_slots = jnp.where(valid, slots, B)
    bh_lens = state.bh_lens.at[:, safe_slots].set(
        jnp.where(valid[None, :, None], new_lens, 0), mode="drop"
    )
    return state._replace(kv_pages=kv_pages, bh_lens=bh_lens)


def store_decode_blocks(
    geom: KVCacheGeometry,
    state: KVCacheState,
    k_all: jax.Array,  # [L, Bd, H, D] one token per (layer, slot, head)
    v_all: jax.Array,
    slots: jax.Array,  # [Bd]
    valid: jax.Array,  # [Bd] bool
    vblk: jax.Array,  # [L, Bd] view-block index ((l*P + p0) // H)
    dec_off: jax.Array,  # [Bd] in-block row offset (uniform over layers/heads)
    cur: jax.Array,  # [L, Bd, H] pre-gathered current lengths
) -> KVCacheState:
    """Decode append into aligned decode blocks.

    A decode block is a run of H consecutive, H-aligned page ids handed to a
    (layer, slot) by PageAllocator.alloc_decode_blocks: page p0+h belongs to
    head h. Because compressed retained lengths are page-aligned
    (pad_retained_to_page, reference kv_cache/store_kv_cache.py:178-248),
    every head of a slot appends at the SAME in-block offset, so the whole
    step's L*Bd*H rows collapse to a scatter of L*Bd windows of [H, 2D]
    through a bitcast view [NB, H, page_size, 2D] of the same pages buffer —
    replacing the reference's per-row in-kernel append
    (kv_cache/store_kv_cache.py:374-466) and the row-scatter fallback above
    (XLA serializes scatters per index; fewer, wider windows are the win).

    Lanes without a block (dead / padding / fallback) must carry an
    out-of-range `vblk` — the scatter drops them.
    """
    L, Bd, H, D = k_all.shape
    page = geom.page_size
    NB = geom.total_rows // (H * page)
    view = state.kv_pages.reshape(NB, H, page, 2 * D)
    kv = cast_to_cache(jnp.concatenate([k_all, v_all], axis=-1), view.dtype)
    vblk = jnp.where(valid[None, :], vblk, NB)
    # Advanced indices on dims 0 and 2 broadcast to [L, Bd] and move to the
    # front: updates are [L, Bd, H, 2D] — exactly kv's layout. unique:
    # every live (layer, slot) owns a distinct block.
    view = view.at[vblk, :, dec_off[None, :], :].set(
        kv, unique_indices=True, mode="drop"
    )
    kv_pages = view.reshape(geom.total_rows, 2 * D)
    new_lens = cur + valid[None, :, None].astype(cur.dtype)
    B = state.bh_lens.shape[1]
    safe_slots = jnp.where(valid, slots, B)
    bh_lens = state.bh_lens.at[:, safe_slots].set(
        jnp.where(valid[None, :, None], new_lens, 0), mode="drop"
    )
    return state._replace(kv_pages=kv_pages, bh_lens=bh_lens)


def flush_decode_window(
    geom: KVCacheGeometry,
    state: KVCacheState,
    recent: jax.Array,  # [L, Bd, H, W, 2D] loop window (K | V lanes)
    lens0: jax.Array,  # [L, Bd, H] pre-loop cached lengths
    appended: jax.Array,  # [Bd] tokens appended during the loop
    slots: jax.Array,  # [Bd]
    valid: jax.Array,  # [Bd] bool
    pt_sel: jax.Array,  # [L, Bd, H, maxp] pre-gathered page-table rows
) -> KVCacheState:
    """Flush a fused decode loop's recent-token window to the paged cache.

    The deferred decode append (reference appends per token in-kernel,
    kv_cache/store_kv_cache.py:374-466; the row-scatter analog here costs
    ~2.95 ms/step at B=64 — NOTES.md round 4) accumulates the loop's W steps
    of K/V in `recent` (attention reads it as a window operand) and lands
    them in ONE pass of contiguous-window scatters: per (layer, lane, head),
    the appended run [s, s+n) is covered by F-token, F-aligned blocks
    (F = min(W, page) divides the page, so a block never straddles pages —
    XLA realizes page-straddling scatters by transposing the whole pool,
    mb_scatter_mem). Block 0 may start before `s`; those rows are re-written
    with their current cache values (one F-row gather). Rows past `s + n`
    inside a kept block receive window garbage — harmless, `bh_lens` bounds
    every reader and the page is owned by this head.
    """
    L, Bd, H, W, D2 = recent.shape
    page = geom.page_size
    maxp = pt_sel.shape[-1]
    F = min(W, page)
    NB = W // F + 1  # F-aligned blocks covering [floor(s/F)*F, s + W)
    s = lens0  # [L, Bd, H]
    n = appended[None, :, None].astype(jnp.int32)  # [1, Bd, 1]
    w0 = (s // F) * F
    layer_rows = (
        jnp.arange(L, dtype=jnp.int32)[:, None, None] * geom.rows_per_layer
    )
    offs = jnp.arange(F, dtype=jnp.int32)

    def block_start_rows(t0):
        """Cache row of token t0 (t0 F-aligned -> inside one page)."""
        pcol = jnp.minimum(t0 // page, maxp - 1)
        pid = jnp.take_along_axis(pt_sel, pcol[..., None], axis=3)[..., 0]
        return layer_rows + pid * page + t0 % page  # [L, Bd, H]

    # Seed block 0 with current cache contents for rows in [w0, s).
    rows0 = block_start_rows(w0)
    seed = state.kv_pages[
        jnp.clip(rows0[..., None] + offs, 0, state.kv_pages.shape[0] - 1)
    ]  # [L, Bd, H, F, 2D]

    blocks, starts, keep = [], [], []
    for j in range(NB):
        t0 = w0 + j * F
        tok = t0[..., None] + offs  # [L, Bd, H, F]
        rel = jnp.clip(tok - s[..., None], 0, W - 1)
        newv = jnp.take_along_axis(recent, rel[..., None], axis=3)
        if j == 0:
            newv = jnp.where(
                (tok < s[..., None])[..., None], seed.astype(recent.dtype),
                newv,
            )
        blocks.append(newv)
        starts.append(block_start_rows(t0))
        # Keep blocks containing at least one appended row, on live lanes.
        keep.append((t0 < s + n) & (n > 0) & valid[None, :, None])
    upd = cast_to_cache(jnp.stack(blocks, axis=3), state.kv_pages.dtype)
    start_rows = jnp.stack(starts, axis=3)  # [L, Bd, H, NB]
    keep_m = jnp.stack(keep, axis=3)
    start_rows = jnp.where(keep_m, start_rows, geom.total_rows)
    idx = jnp.stack(
        [start_rows.reshape(-1), jnp.zeros(L * Bd * H * NB, jnp.int32)],
        axis=-1,
    )  # [(N), 2] (row_start, lane 0)
    kv_pages = jax.lax.scatter(
        state.kv_pages,
        idx,
        upd.reshape(-1, F, D2),
        jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2),
            inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0, 1),
        ),
        indices_are_sorted=False,
        unique_indices=True,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
    )
    new_lens = s + n * valid[None, :, None].astype(jnp.int32)
    B = state.bh_lens.shape[1]
    safe_slots = jnp.where(valid, slots, B)
    bh_lens = state.bh_lens.at[:, safe_slots].set(
        jnp.where(valid[None, :, None], new_lens, 0), mode="drop"
    )
    return state._replace(kv_pages=kv_pages, bh_lens=bh_lens)


def store_decode(
    geom: KVCacheGeometry,
    state: KVCacheState,
    layer,
    k_new: jax.Array,  # [Bd, H, D] one token per slot
    v_new: jax.Array,
    slots: jax.Array,  # [Bd]
    valid: jax.Array,  # [Bd] bool
) -> KVCacheState:
    """Decode append: one token per (slot, head) at the current length
    (reference: kv_cache/store_kv_cache.py:374-466)."""
    Bd, H, D = k_new.shape
    pt_l = jax.lax.dynamic_index_in_dim(state.page_table, layer, 0, keepdims=False)
    lens_l = jax.lax.dynamic_index_in_dim(state.bh_lens, layer, 0, keepdims=False)
    cur = lens_l[slots]  # [Bd, H]
    heads = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None, :], (Bd, H))
    rows = _cache_rows(
        geom, layer, pt_l, slots[:, None], heads, cur, valid[:, None]
    ).reshape(Bd * H)
    kv = jnp.concatenate(
        [k_new.reshape(Bd * H, D), v_new.reshape(Bd * H, D)], axis=-1
    )
    kv = cast_to_cache(kv, state.kv_pages.dtype)
    kv_pages = state.kv_pages.at[rows].set(kv, unique_indices=True, mode="drop")
    bh_lens = _update_lens(state.bh_lens, layer, slots, cur + 1, valid)
    return state._replace(kv_pages=kv_pages, bh_lens=bh_lens)


def _update_lens(bh_lens, layer, slots, new_lens, seq_valid):
    """Set bh_lens[layer, slots] = new_lens for valid sequences."""
    B = bh_lens.shape[1]
    safe_slots = jnp.where(seq_valid, slots, B)  # OOB rows are dropped
    layer_ids = jnp.broadcast_to(
        jnp.asarray(layer, jnp.int32), safe_slots.shape
    )
    return bh_lens.at[layer_ids, safe_slots].set(new_lens, mode="drop")
